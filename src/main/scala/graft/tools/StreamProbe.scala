package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Triage for the r9 streaming-trio medians (VERDICT r9 item 3:
  * q55 1.44→3.75 s, q72 1.81→3.29 s, q86 2.44→3.74 s r8→r9,
  * untriaged): runs each query isolated, median-of-N, and ATTRIBUTES
  * each run's wall time using the engine's own progress events —
  * `triggerExecution` duration summed over micro-batches is the real
  * processing time; the remainder (query planning/start, checkpoint
  * dir setup, memory-sink registration, termination) is fixed
  * per-query-START overhead that a sweep bills to the query but a
  * continuous production stream pays exactly once. If isolated
  * medians sit at the r8 level with pins green, the r9 shift is
  * sweep-context load, not the two r9 streaming additions
  * (StreamTopK/StreamDedupGate register no global conf — verified:
  * both configure only their own query's trigger/checkpoint).
  *
  * Usage: `runMain graft.tools.StreamProbe [sfDir] [runs]`
  * (defaults /root/testdata/sf0.1, 5). Conclusion lands in README's
  * bench-protocol note.
  */
object StreamProbe {
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

    // per-run accumulators fed by the engine's progress events
    val batchMs = mutable.Buffer[Long]()
    val listener = new StreamingQueryListener {
      def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        batchMs.synchronized {
          batchMs += Option(e.progress.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)
        }
      def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    // page-cache warmup, same as Bench
    graft.core.T.names.foreach { t =>
      graft.core.T.df(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    for (q <- Seq("q55_stream_window", "q72_stream_static_join", "q86_stream_stream_join")) {
      val total = Vector.newBuilder[Double]
      val exec = Vector.newBuilder[Double]
      val nBatches = Vector.newBuilder[Int]
      for (_ <- 1 to runs) {
        batchMs.synchronized(batchMs.clear())
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        total += (System.nanoTime() - t0) / 1e9
        // listener events are async; drain before reading
        spark.streams.resetTerminated()
        Thread.sleep(300)
        batchMs.synchronized {
          exec += batchMs.sum / 1e3
          nBatches += batchMs.size
        }
      }
      val (t, x, nb) = (total.result(), exec.result(), nBatches.result())
      def med(xs: Vector[Double]) = graft.Bench.median(xs)
      println(f"$q%-24s total median ${med(t)}%5.2f s  batch-exec median ${med(x)}%5.2f s" +
        f"  start/stop overhead ${med(t) - med(x)}%5.2f s" +
        f"  batches ${nb.headOption.getOrElse(0)}%d" +
        f"  (total [${t.min}%.2f,${t.max}%.2f])")
    }
    spark.stop()
  }
}
