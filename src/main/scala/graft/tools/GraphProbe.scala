package graft.tools

import org.apache.spark.sql.SparkSession

/** Attributes the graph queries' bench cost (VERDICT r9 item 4: README
  * claimed q113 ≈5–7 s / q109 ≈3.6 s while the driver sweep measured
  * 13.7 / 8.9 s) by separating the PER-SWEEP CACHE REFILL — the
  * persisted pair/edge/orientation frames that `Caches.releaseAll`
  * drops between bench sweeps, so every sweep's first (only) run of
  * each query pays the full rebuild — from the query's own work on hot
  * caches.
  *
  * Per run it times the query twice in the same session: COLD (caches
  * just released — what Bench bills) and HOT (cached frames resident —
  * the marginal cost of the query itself). cold − hot = the refill
  * share: for q113 the one-scan pair build + distinct, the degree
  * aggregate + orientation joins + repartition, the bloom build and
  * its sizing `pairs.count()`; for q109 the orders⋈lineitem distinct
  * pair build and the degree-joined edge frame's repartition+persist.
  *
  * Usage: `runMain graft.tools.GraphProbe [sfDir] [runs]`
  * (defaults /root/testdata/sf0.1, 5). The conclusion lands in the
  * README bench-protocol note.
  */
object GraphProbe {
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

    def time(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // page-cache warmup (Bench does the same before timing)
    graft.core.T.names.foreach { t =>
      graft.core.T.df(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    for (q <- Seq("q109_pagerank", "q113_triangle_count")) {
      val cold = Vector.newBuilder[Double]
      val hot = Vector.newBuilder[Double]
      for (_ <- 1 to runs) {
        graft.Caches.releaseAll(spark) // the bench's between-sweep state
        cold += time(q)
        hot += time(q)
      }
      val (c, h) = (cold.result(), hot.result())
      def med(xs: Vector[Double]) = graft.Bench.median(xs)
      println(f"$q%-22s cold median ${med(c)}%5.2f s  hot median ${med(h)}%5.2f s" +
        f"  refill share ${med(c) - med(h)}%5.2f s" +
        f"  (cold [${c.min}%.2f,${c.max}%.2f] hot [${h.min}%.2f,${h.max}%.2f])")
    }
    spark.stop()
  }
}
