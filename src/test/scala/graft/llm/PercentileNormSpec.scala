package graft.llm

import graft.SparkSpec

/** Gate for q205's within-source percentile normalization: every
  * (doc, ttr, pct) row must match an exact Scala brute force on a hand
  * corpus with engineered ties (tied docs share a percentile), a
  * single-doc source (NULL percentile), and a zero-token doc (dropped);
  * the fixture run must satisfy the percentile laws. */
class PercentileNormSpec extends SparkSpec {

  private val q205 = graft.SparkEntry.all.find(_.name == "q205_percentile_norm").get

  private def brute(rows: Seq[(Long, String, String)]): Seq[(Long, String, Long, Option[Long])] = {
    val scored = rows.flatMap { case (id, src, t) =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((id, src, 1000000L * toks.distinct.length / toks.length))
    }
    val bySrc = scored.groupBy(_._2)
    scored.sortBy(_._1).map { case (id, src, ttr) =>
      val peers = bySrc(src)
      val below = peers.count(_._3 < ttr).toLong
      val pct = if (peers.size == 1) None else Some(1000L * below / (peers.size - 1))
      (id, src, ttr, pct)
    }
  }

  private def run(rows: Seq[(Long, String, String)]): Seq[(Long, String, Long, Option[Long])] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pctn").toString
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    q205.run(spark, dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
  }

  test("matches the brute force: ties share, singletons NULL, empty drops") {
    val rows = Seq(
      (1L, "a", "x x x x"),            // ttr 250000
      (2L, "a", "x y x y"),            // ttr 500000 (tie with 3)
      (3L, "a", "p q p q"),            // ttr 500000 (tie with 2)
      (4L, "a", "a b c d"),            // ttr 1000000 -> pct 1000
      (5L, "solo", "u v w"),           // single-doc source -> NULL
      (6L, "a", "   "))                // zero tokens -> dropped
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.map(r => r._1 -> r._4).toMap
    assert(m(2L) == m(3L))             // tied docs share the percentile
    assert(m(4L).contains(1000L) && m(1L).contains(0L))
    assert(m(5L).isEmpty && !got.exists(_._1 == 6L))
  }

  test("fixture: percentile laws per source") {
    val out = q205.run(spark, "/root/testdata/sf0.001").collect().map(r =>
      (r.getString(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rs) =>
      if (rs.length == 1) assert(rs.head._3.isEmpty)
      else {
        assert(rs.exists(_._3.contains(0L)))            // a minimum exists
        rs.foreach(r => assert(r._3.exists(p => p >= 0 && p <= 1000)))
        // monotone: higher ttr never gets a lower percentile
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(x, y) => assert(x._3.get <= y._3.get)
          case _ => ()
        }
      }
    }
  }
}
