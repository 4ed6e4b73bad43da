package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain <queryName> [sfDir]`
  * prints the executed plan of a registered query (formatted mode) —
  * the per-operator feedback loop for pushdown/pruning/exchange
  * checks without spinning up a test suite. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName|qNN> [sfDir]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's union-preserves-partitioning feature zips co-partitioned
      // union children; a memoized frame whose AQE-materialized partition
      // count diverges from its claimed partitioning crashes the zip
      // (q233 hot at clone10) -- keep the sound concatenating Union
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = graft.SparkEntry.queries.keys
      .find(k => k == args(0) || k.takeWhile(_ != '_') == args(0))
      .getOrElse(sys.error(s"unknown query ${args(0)}"))
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
