package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print the FINAL adaptive physical plan of named queries
  * (collects first — AQE exchange reuse and skew splits only appear at
  * runtime, so the pre-execution plan under-reports reuse). Usage:
  * `runMain graft.tools.PlanDump q109_pagerank [qNNN...]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // env overrides (round 21): SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
    // let the dump run at the bench's fixture + width, where AQE's
    // runtime strategy choices (broadcast conversions, coalescing)
    // match the board being debugged.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.SessionTuning.configure(graft.core.LocalDirs.configure(SparkSession.builder())).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.collect() // materialize so AQE finalizes (exchange reuse is runtime)
      println(df.queryExecution.executedPlan.toString)
    }
    graft.Caches.releaseAll(spark)
    spark.stop()
  }
}
