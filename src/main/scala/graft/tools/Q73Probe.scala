package graft.tools

import org.apache.spark.sql.SparkSession

/** Names the q73 intra-sweep spread (BENCH_r08: 2.3 → 11.5 s across
  * sweeps with an identical plan — VERDICT r8 item 5): runs the
  * k-means query N times under the bench's between-sweep
  * `Caches.releaseAll`, printing per-run wall seconds alongside the
  * two suspects' counters for that run:
  *
  *  - JVM GC time delta (GarbageCollectorMXBeans) — old-gen pressure
  *    from the released-and-rebuilt persisted frames;
  *  - whole-stage-codegen compiles (Spark's CodegenMetrics) — each
  *    k-means round embeds the UPDATED centroids as literals, so every
  *    round of every run generates and Janino-compiles fresh classes;
  *    a compile backlog under JIT/CodeCache pressure serializes them.
  *
  * Usage: `runMain graft.tools.Q73Probe [sfDir] [runs]`
  * (defaults /root/testdata/sf0.1, 5). The conclusion lands in the
  * README bench-protocol note.
  */
object Q73Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val hist = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    def compiles: Long = hist.getCount

    for (i <- 1 to runs) {
      val (gc0, c0, t0) = (gcMs, compiles, System.nanoTime())
      graft.SparkEntry.queries("q73_kmeans_train")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"run $i: wall=$wall%6.2f s  gc=+${gcMs - gc0}%,5d ms  " +
        f"codegenCompiles=+${compiles - c0}%3d (mean ${hist.getSnapshot.getMean}%.0f ms)")
      graft.Caches.releaseAll(spark) // the bench's between-sweep release
    }
    spark.stop()
  }
}
