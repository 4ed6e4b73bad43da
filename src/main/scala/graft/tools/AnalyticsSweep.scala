package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale sweep for the round-10 operators (q124–q127) — the r9
  * CloneFixture discipline that caught q66's hot-bucket quadratic,
  * applied to the newest batch, plus the isolated q124 median the r10
  * sweep spread ([3.4, 15.9] s) calls for.
  *
  * Two axes:
  *   - sf0.01 → sf0.1 (10× rows in documents/orders/lineitem/part):
  *     each query's isolated median must grow ≈ linearly (well under
  *     10× wall — local[32] has idle cores at sf0.01), never
  *     super-linearly.
  *   - ×10 duplicate-heavy clone fixture over sf0.01 (CloneFixture):
  *     q124's adversarial shape — every document 10× under shifted
  *     ids, so every shingle's df inflates 10× and every clone group
  *     collapses into one shingle-class. A hot-shingle quadratic
  *     would blow past linear here; the class collapse + salted df
  *     attach must keep it bounded.
  *
  * Protocol: Bench.timedRun through the noop sink, Caches.releaseAll
  * between runs (every run billed cold, like one sweep entry),
  * median-of-5 for q124 at sf0.1 (the spread-bounding number),
  * median-of-3 elsewhere. Prints one line per (query, fixture).
  */
object AnalyticsSweep {
  def main(args: Array[String]): Unit = {
    val cloneDir = sys.env.getOrElse("SPARK_GRAFT_CLONE_DIR", "/tmp/graft/clone10_sf001")
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

    // clone-adversary members (VERDICT r13 item 4): the clone fixture
    // reshapes documents/embeddings only, so the document-reading
    // similarity joins get a clone10 column; q125–q127 read identical
    // TPC-H tables there and are sf-axis only. For the containment
    // pair class the clone shape is the worst case BY SEMANTICS:
    // every clone contains every other at c = 1, so the TRUE directed
    // output grows ~K² per doc — the number to watch is candidate
    // growth staying proportional to that inherent output, not above.
    val cloneQs = Set("q124_jaccard_prefix_join", "q132_dedup_containment",
      "q135_containment_incremental")
    val qs = Seq("q124_jaccard_prefix_join", "q125_interval_islands",
      "q126_countmin_sketch", "q127_skyline", "q132_dedup_containment",
      "q135_containment_incremental")
      .map(n => graft.SparkEntry.all.find(_.name == n).get)

    def med(q: graft.core.Q, dir: String, runs: Int): (Double, Double, Double) = {
      val ts = (1 to runs).map { _ =>
        val (dt, err) = graft.Bench.timedRun(spark, dir, q)
        require(err.isEmpty, s"${q.name} failed on $dir: $err")
        graft.Caches.releaseAll(spark)
        dt
      }
      (graft.Bench.median(ts), ts.min, ts.max)
    }

    // warmup (codegen + page cache) — one throwaway run of each query
    qs.foreach { q => graft.Bench.timedRun(spark, "/root/testdata/sf0.01", q) }
    graft.Caches.releaseAll(spark)

    val fixtures = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "clone10" -> cloneDir)
    val results = for (q <- qs; (fl, dir) <- fixtures) yield {
      // clone fixture only reshapes documents/embeddings — the TPC-H
      // queries q125-q127 read identical tables there; skip them.
      if (fl == "clone10" && !cloneQs(q.name)) None
      else {
        val runs = if (q.name == "q124_jaccard_prefix_join" && fl == "sf0.1") 5 else 3
        val (m, lo, hi) = med(q, dir, runs)
        println(f"${q.name}%-26s $fl%-8s median $m%7.3f s  [$lo%.3f, $hi%.3f]  runs=$runs")
        Some((q.name, fl, m))
      }
    }
    val byQ = results.flatten.groupBy(_._1)
    byQ.toSeq.sortBy(_._1).foreach { case (n, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      val ratio = m("sf0.1") / m("sf0.01")
      val cl = m.get("clone10").map(c => f"  clone10/sf0.01 ${c / m("sf0.01")}%5.2fx").getOrElse("")
      println(f"$n%-26s 10x-data ratio ${ratio}%5.2fx$cl")
    }

    // ---- q127 prune-rate + wall-time grid (round 13, VERDICT r12
    // item 3): the adaptive quantile-probe path PRICED, not just
    // explained — admit rate, frontier size, candidate-pass seconds,
    // and full-skyline seconds for uniform / skewed / flat synthetic
    // price distributions at 1× and 10× (100k → 1M rows), plus the
    // real part table and the all-equal degenerate. Committed next to
    // the r11 grid-path numbers in README; the flat distribution is
    // the fixture the old fixed 1000-cent grid could not thin (admit
    // was 100%).
    {
      import org.apache.spark.sql.functions._
      def synth(n: Long, kind: String) = {
        val base = spark.range(1, n + 1).toDF("p_partkey")
          .withColumn("h", abs(xxhash64(col("p_partkey"))))
        val pc = kind match {
          case "uniform" => lit(100L) + pmod(col("h"), lit(1000000L))
          case "skewed" => // long right tail, mass at low prices
            (lit(100L) + pow(pmod(col("h"), lit(1000L)).cast("double"), lit(2.5)))
              .cast("long")
          case "flat" => lit(100L) + pmod(col("h"), lit(900L))
          case "allequal" => lit(4242L)
        }
        base.select(col("p_partkey"), pc.as("pc"),
          (lit(1L) + pmod(col("h"), lit(50L))).as("sz"))
      }
      val grid = for (kind <- Seq("uniform", "skewed", "flat");
                      n <- Seq(100000L, 1000000L)) yield (kind, synth(n, kind), n)
      val real = graft.core.T.df(spark, "/root/testdata/sf0.1", "part")
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
          col("p_size").cast("long").as("sz"))
      val cases = grid ++ Seq(
        ("part_sf0.1", real, real.count()),
        ("allequal", synth(100000L, "allequal"), 100000L))
      for ((kind, df, n) <- cases) {
        val t0 = System.nanoTime()
        val c = graft.ops.Analytics.skylineCandidates(df).count()
        val candSec = (System.nanoTime() - t0) / 1e9
        graft.Caches.releaseAll(spark)
        val t1 = System.nanoTime()
        val k = graft.ops.Analytics.skyline(df).count()
        val fullSec = (System.nanoTime() - t1) / 1e9
        graft.Caches.releaseAll(spark)
        println(f"q127 prune $kind%-10s n=$n%8d  admit ${100.0 * c / n}%6.2f%%  " +
          f"frontier $k%6d  cand $candSec%6.3f s  full $fullSec%6.3f s")
      }
    }
    spark.stop()
  }
}
