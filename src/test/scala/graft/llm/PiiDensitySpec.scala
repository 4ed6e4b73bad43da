package graft.llm

import graft.SparkSpec

/** Gate for q193's PII density census: per-source doc/match counts
  * must match a Scala brute force on a hand corpus where some docs
  * carry PII in the TEXT itself (not only via the deterministic
  * augmentation), and the fixture run must satisfy the counting laws. */
class PiiDensitySpec extends SparkSpec {

  private val q193 = graft.SparkEntry.all.find(_.name == "q193_pii_density").get

  private def aug(id: Long, text: String): String =
    text +
      (if (id % 3 == 0) s" user$id@mail.example.com" else "") +
      (if (id % 5 == 0) f" 555-${id % 10000}%04d" else "")

  private def brute(rows: Seq[(Long, String, String)]): Seq[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val email = LlmText.EmailRe.r
    val phone = LlmText.PhoneRe.r
    rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (src, ds) =>
      val counts = ds.map { case (id, t, _) =>
        val a = aug(id, t)
        (email.findAllIn(a).size.toLong, phone.findAllIn(a).size.toLong)
      }
      val (n, ed, pd) = (counts.size.toLong,
        counts.count(_._1 > 0).toLong, counts.count(_._2 > 0).toLong)
      (src, n, ed, pd, counts.map(_._1).sum, counts.map(_._2).sum,
        1000L * ed / n, 1000L * pd / n)
    }
  }

  test("matches the brute force incl. PII already present in text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("piidens").toString
    val rows = Seq(
      (1L, "plain words only", "s1"),
      (2L, "mail me at someone@example.org today", "s1"), // text PII
      (3L, "call 555-1234 and 555-9999", "s1"),           // two text phones
      (4L, "nothing here", "s2"),
      (5L, "or here", "s2"),
      (6L, "both someone@a.io and 555-0000", "s2"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q193.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == brute(rows), s"got ${out.toSeq}\nexpected ${brute(rows)}")
  }

  test("fixture: match mass bounds doc counts, milli laws exact") {
    val dir = "/root/testdata/sf0.001"
    val out = q193.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, n, ed, pd, ne, np, em, pm) =>
      assert(ed <= n && pd <= n && ne >= ed && np >= pd)
      assert(em == 1000L * ed / n && pm == 1000L * pd / n)
    }
    // the augmentation guarantees a non-degenerate census
    assert(out.map(_._3).sum > 0 && out.map(_._4).sum > 0)
  }
}
