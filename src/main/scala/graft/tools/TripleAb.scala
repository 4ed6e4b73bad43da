package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-session A/B for q133's item-frame sourcing: direct fact-scan
  * items (the r13 form) vs the family-cached custItems persist.
  * Interleaved rounds so ambient host noise hits both arms equally —
  * the cross-time QueryProbe comparison was swinging 2× on identical
  * code. Usage: runMain graft.tools.TripleAb [sfDir] [rounds] */
object TripleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's union-preserves-partitioning feature zips co-partitioned
      // union children; a memoized frame whose AQE-materialized partition
      // count diverges from its claimed partitioning crashes the zip
      // (q233 hot at clone10) -- keep the sound concatenating Union
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.core.T.names.foreach(t => graft.core.T.df(s, dir, t).count())

    def direct() = {
      val items = graft.core.T.df(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(graft.core.T.df(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k"), col("l_partkey").as("p"))
        .distinct()
      graft.ops.Graph.frequentTriples(items, 3).count()
    }
    def cached() = {
      graft.SparkEntry.queries("q133_frequent_triples")(s, dir).count()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val (da, db) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to rounds) {
      graft.Caches.releaseAll(s)
      da += time(direct _)
      graft.Caches.releaseAll(s)
      db += time(cached _)
    }
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"direct  cold rounds: ${da.result().map(x => f"$x%.2f").mkString(" ")}  median ${med(da.result())}%.2f")
    println(f"cachedQ cold rounds: ${db.result().map(x => f"$x%.2f").mkString(" ")}  median ${med(db.result())}%.2f")
    s.stop()
  }
}
