package graft.ops

import graft.SparkSpec

/** Gate for q208's median/MAD outlier census: every event_type row
  * must match an exact Scala brute force (lower-median semantics, even
  * and odd counts, an engineered outlier, an all-equal stream whose
  * MAD is zero and therefore flags everything off-median); the fixture
  * run must satisfy the robust-statistics laws. */
class RobustAnomalySpec extends SparkSpec {

  private val q208 = graft.SparkEntry.all.find(_.name == "q208_robust_anomaly").get

  private def lowerMedian(vs: Seq[Long]): Long = {
    val s = vs.sorted
    s(((vs.size + 1) / 2) - 1)
  }

  private def brute(rows: Seq[(String, Double)]): Seq[(String, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val cents = es.map(e => math.round(e._2 * 100))
      val med = lowerMedian(cents)
      val mad = lowerMedian(cents.map(c => math.abs(c - med)))
      val out = cents.count(c => math.abs(c - med) > 3 * mad).toLong
      (t, cents.size.toLong, med, mad, out, 1000L * out / cents.size)
    }

  private def run(rows: Seq[(String, Double)]): Seq[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000), i.toLong % 7, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = q208.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    graft.Caches.releaseAll(spark)
    out
  }

  test("matches the brute force: odd/even n, an outlier, zero-MAD stream") {
    val rows =
      Seq.tabulate(9)(i => ("pay", 10.0 + i * 0.01)) ++ // odd n, tight spread
      Seq(("pay", 500.0)) ++                            // the outlier
      Seq.tabulate(6)(i => ("view", 1.0 + i)) ++        // even n
      Seq.fill(5)(("ping", 2.5)) ++ Seq(("ping", 2.51)) // MAD 0: off-median flags
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.map(r => r._1 -> r).toMap
    assert(m("pay")._5 == 1L)   // exactly the planted outlier
    assert(m("ping")._4 == 0L && m("ping")._5 == 1L) // zero MAD flags the 2.51
  }

  test("fixture: robust laws hold per event_type") {
    val out = q208.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mad, nOut, milli) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(mad >= 0 && nOut <= n)
      assert(nOut * 2 <= n) // at most half the mass can sit past 3 MAD
      assert(milli == 1000L * nOut / n)
    }
    graft.Caches.releaseAll(spark)
  }
}
