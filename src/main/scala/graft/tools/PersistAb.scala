package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved persist-vs-no-persist A/B for q205 and q210 — the
  * round-18 adjudication VERDICT r17 #1 asked for. Both queries got
  * the ADVICE-r16 "persist the shared frame" fix WITHOUT the repo's
  * TripleAb measured-decision protocol, and both became the official
  * board's only >2× movers (q210 0.68 → 2.18 flat across sweeps,
  * q205 0.43 → 1.17). The r14 q133 lesson says a persist can LOSE:
  * the InMemoryRelation changes the optimizer's size evidence and
  * blocks exchange reuse, so cache-vs-recompute is a measured
  * decision per consumer.
  *
  * Protocol = TripleAb: one session, page-cache warmup, then per
  * round `Caches.releaseAll` before each arm so ambient host noise
  * hits both arms equally; fixed-work calibration brackets the
  * session. Arm P = persist (the shipped r17 form), arm N = the
  * pre-r17 unpersisted form — same plan builders, one boolean apart
  * (`LlmText.percentileNorm` / `TextMining.signalConcordance`).
  *
  * Usage: runMain graft.tools.PersistAb [sfDir] [rounds]
  */
object PersistAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
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
    graft.core.T.names.foreach { t =>
      graft.core.T.df(s, dir, t).write.format("noop").mode("overwrite").save()
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val arms: Seq[(String, Boolean => Unit)] = Seq(
      "q205" -> ((p: Boolean) => noop(graft.llm.LlmText.percentileNorm(s, dir, p))),
      "q210" -> ((p: Boolean) => noop(graft.llm.TextMining.signalConcordance(s, dir, p))))

    val (h0, s0) = graft.Bench.calibrate(s)
    println(f"calib pre: hash $h0%.3f s  spark $s0%.3f s")
    for ((name, run) <- arms) {
      val (tp, tn) = (Vector.newBuilder[Double], Vector.newBuilder[Double])
      for (_ <- 1 to rounds) {
        graft.Caches.releaseAll(s)
        tp += time(run(true))
        graft.Caches.releaseAll(s)
        tn += time(run(false))
      }
      val (p, n) = (tp.result(), tn.result())
      def med(xs: Vector[Double]) = graft.Bench.median(xs)
      println(f"$name persist   rounds ${p.map(x => f"$x%.2f").mkString(" ")}  median ${med(p)}%.2f")
      println(f"$name noPersist rounds ${n.map(x => f"$x%.2f").mkString(" ")}  median ${med(n)}%.2f")
    }
    val (h1, s1) = graft.Bench.calibrate(s)
    println(f"calib post: hash $h1%.3f s  spark $s1%.3f s")
    s.stop()
  }
}
