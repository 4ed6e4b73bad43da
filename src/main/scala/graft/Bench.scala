package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON metric line (last line of
  * output — the consumer keeps only the tail).
  *
  * Protocol (round 8): the WHOLE sweep runs SPARK_GRAFT_REPEAT times
  * (default 3) with every memoization cache dropped between sweeps, and
  * each query reports its per-sweep MEDIAN. A single run cannot tell a
  * real regression from run-to-run noise (round 7's q57 flag spent a
  * whole verdict cycle on exactly that ambiguity); sweep-level repeats
  * keep the intra-sweep cache-sharing semantics identical to a single
  * run (each family's build cost is billed to its first consumer, as
  * in rounds 1–7) while the median kills one-off noise. The line also
  * carries `runs` and the widest per-query `spread`s so a future
  * regression is immediately classifiable as noise vs real.
  *
  * Failure honesty: a query that throws is reported as `-1` in the
  * queries map plus an entry in `errors` — never as a (fast) success.
  * Round 7 shipped a bare `catch { case _ => () }` here, which would
  * have silently flattered the total had anything crashed (VERDICT r7
  * item 2). BenchSpec pins the poisoned-query rendering.
  */
object Bench {

  /** One timed evaluation of `q` through the noop sink — the sink
    * forces FULL evaluation of every output column (count() would let
    * Catalyst prune the projections away and under-report the real
    * work). Returns (seconds, error): error = exception class name,
    * never rethrown — one broken query must not hide the numbers of
    * the other 90+. */
  def timedRun(spark: SparkSession, sfDir: String, q: graft.core.Q): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err =
      try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(e.getClass.getSimpleName) }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Render the headline JSON line. Pure — BenchSpec drives it with a
    * poisoned query to pin the error rendering. `times` holds each
    * query's per-sweep seconds (successful runs only; empty = every
    * run failed); `errors` holds the first exception class per failed
    * query. The line must stay well under ~2000 chars (the consumer
    * keeps only the output tail — rounds 1–6 lost the headline to
    * truncation): short qNN keys, medians only, and spread for just
    * the 5 widest-relative-spread queries. */
  def metricLine(sfDir: String, runs: Int,
                 times: Seq[(String, Seq[Double])],
                 errors: Map[String, String]): String = {
    def short(n: String) = n.takeWhile(_ != '_')
    val meds = times.map { case (n, ts) =>
      n -> (if (errors.contains(n) || ts.isEmpty) -1.0 else median(ts))
    }
    val qs = meds.map { case (n, m) => "\"" + short(n) + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val total = meds.collect { case (_, m) if m >= 0 => m }.sum
    val spread =
      if (runs <= 1) ""
      else {
        // errored queries render -1 in `queries`; their surviving
        // successful-sweep timings must not also surface as a spread
        // row (confusing telemetry for regression classification —
        // ADVICE r8)
        val worst = times
          .collect { case (n, ts)
              if !errors.contains(n) && ts.size > 1 && median(ts) > 0.2 =>
            (n, ts.min, ts.max, (ts.max - ts.min) / median(ts)) }
          .sortBy(-_._4).take(5)
          .map { case (n, lo, hi, _) => "\"" + short(n) + "\":[" + fmt(lo) + "," + fmt(hi) + "]" }
        if (worst.isEmpty) "" else worst.mkString(",\"spread\":{", ",", "}")
      }
    val errs =
      if (errors.isEmpty) ""
      else errors.map { case (n, e) => "\"" + short(n) + "\":\"" + e + "\"" }
        .mkString(",\"errors\":{", ",", "}")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,""" +
      s""""error_count":${errors.size}$errs,"queries":$qs$spread,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Registration order keeps each query family contiguous (the old
    // HashMap iteration interleaved families arbitrarily), and each
    // family's memoization caches are released right after its last
    // consumer — accumulated persisted frames across the whole sweep
    // were the prime suspect for round 4's diffuse 2-8x regressions.
    // SPARK_GRAFT_ONLY=q58,q1 -> bench only the named queries (qNN
    // prefixes or full names); local-iteration knob, unset in driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ns) => SparkEntry.all.filter(q =>
        ns(q.name) || ns(q.name.takeWhile(_ != '_')))
      case None => SparkEntry.all
    }
    val repeat = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt)
    val order = selected.map(_.name)
    val hooks = Caches.releaseHooks(order)
    // untimed warmup: the first jobs in a fresh JVM pay several seconds
    // of one-time classloading/codegen-infrastructure cost (parquet
    // reader, hash-aggregate, broadcast-join and window codegen paths)
    // that would otherwise be billed to whichever queries happen to run
    // first — warm them on a throwaway 5-row frame so per-query numbers
    // measure the queries. (q1 measured 2.7 s billed cold vs 0.8 s
    // warm with an identical plan.)
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.groupBy(col("r_name"))
        .agg(sum(col("r_regionkey").cast("decimal(12,2)")).as("s"), count(lit(1)).as("c"))
        .join(broadcast(r.select(col("r_name"))), "r_name")
        .withColumn("rk", row_number().over(Window.partitionBy("r_name").orderBy("s")))
        .write.format("noop").mode("overwrite").save()
      // also fault the table FILES into the OS page cache (all columns,
      // not count() — count satisfies from footers): the first query to
      // touch each table otherwise gets billed its cold read (q1
      // measured 4.9 s cold vs 1.9 s warm on an identical plan)
      graft.core.T.names.foreach { t =>
        graft.core.T.df(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      }
    } catch { case _: Throwable => () }
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to repeat) {
      selected.foreach { q =>
        val (dt, err) = timedRun(spark, sfDir, q)
        err match {
          case Some(e) => errors.getOrElseUpdate(q.name, e)
          case None => times(q.name) = times.getOrElse(q.name, Vector.empty) :+ dt
        }
        hooks.getOrElse(q.name, Nil).foreach(_(spark))
      }
      // drop EVERY memo map entry between sweeps so each sweep rebuilds
      // its caches and bills the build to the same first consumer — the
      // per-sweep numbers stay comparable to rounds 1-7's single runs.
      Caches.releaseAll(spark)
    }
    val ordered = order.map(n => n -> times.getOrElse(n, Vector.empty))
    println(metricLine(sfDir, repeat, ordered, errors.toMap))
    spark.stop()
  }
}
