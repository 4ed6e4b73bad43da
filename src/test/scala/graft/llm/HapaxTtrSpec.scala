package graft.llm

import graft.SparkSpec

/** Gate for q187's hapax / type-token vocabulary health: per-source
  * type, hapax, and dis-legomena counts plus the milli/micro ratios
  * must match an exact Scala brute force on a hand corpus built to
  * exercise case folding, empty-token noise, and both legomena
  * classes; the fixture run must satisfy the counting laws. */
class HapaxTtrSpec extends SparkSpec {

  private val q187 = graft.SparkEntry.all.find(_.name == "q187_hapax_ttr").get

  private def brute(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2.toLowerCase.split(" ").filter(_.nonEmpty))
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (nTok, nTyp) = (toks.size.toLong, counts.size.toLong)
      val hapax = counts.count(_._2 == 1L).toLong
      val dis = counts.count(_._2 == 2L).toLong
      (src, nTok, nTyp, hapax, dis, 1000L * hapax / nTyp, 1000000L * nTyp / nTok)
    }

  test("matches the brute force on a hand corpus with both legomena classes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hapax").toString
    val rows = Seq(
      // s1: "the" x3, "cat"/"CAT" fold to one dis, "sat"/"mat"/"rug" hapax
      ("s1", "the cat sat"), ("s1", "the CAT  mat"), ("s1", "the rug"),
      // s2: all hapax (OCR-noise profile), double spaces = empty tokens
      ("s2", "qx7  zz9 kkj"),
      // s3: one word repeated (template profile) + one hapax
      ("s3", "ad ad ad ad buy"))
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q187.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == brute(rows), s"got ${out.toSeq}\nexpected ${brute(rows)}")
    TextMining.release(spark)
  }

  test("fixture: legomena bounds and exact ratio laws hold per source") {
    val dir = "/root/testdata/sf0.001"
    val out = q187.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.foreach { case (_, nTok, nTyp, hapax, dis, hm, ttr) =>
      assert(hapax + dis <= nTyp && nTyp <= nTok)
      assert(hm == 1000L * hapax / nTyp)
      assert(ttr == 1000000L * nTyp / nTok)
    }
    TextMining.release(spark)
  }
}
