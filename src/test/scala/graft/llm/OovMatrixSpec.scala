package graft.llm

import graft.SparkSpec

/** Gate for q198's cross-source OOV matrix: every ordered source pair
  * must match an exact Scala brute force on a hand corpus built to
  * exercise asymmetry (a small source covered by a big one but not
  * vice versa), zero-overlap pairs (present in the grid with full OOV),
  * case folding, empty-token noise, and occurrence-vs-type divergence
  * (a covered head word carrying most of the mass). */
class OovMatrixSpec extends SparkSpec {

  private val q198 = graft.SparkEntry.all.find(_.name == "q198_oov_matrix").get

  private def counts(rows: Seq[(String, String)]): Map[String, Map[String, Long]] =
    rows.groupBy(_._1).view.mapValues { ds =>
      ds.flatMap(_._2.toLowerCase.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap

  private def brute(rows: Seq[(String, String)]): Seq[(String, String, Long, Long, Long, Long)] = {
    val cs = counts(rows).filter(_._2.nonEmpty)
    (for {
      a <- cs.keys.toSeq; b <- cs.keys.toSeq if a != b
    } yield {
      val (ca, cb) = (cs(a), cs(b))
      val nOcc = ca.values.sum
      val nTypes = ca.size.toLong
      val covOcc = ca.collect { case (w, c) if cb.contains(w) => c }.sum
      val covTyp = ca.count { case (w, _) => cb.contains(w) }.toLong
      (a, b, nOcc - covOcc, nTypes - covTyp,
        1000L * (nOcc - covOcc) / nOcc, 1000L * (nTypes - covTyp) / nTypes)
    }).sortBy(p => (p._1, p._2))
  }

  private def run(rows: Seq[(String, String)]): Seq[(String, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("oov").toString
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q198.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    TextMining.release(spark)
    out
  }

  test("matches the brute force: asymmetry, zero overlap, head-mass coverage") {
    val rows = Seq(
      // big: covers ALL of small's vocab; small covers little of big's
      ("big", "the the the the cat sat on on a mat near a rug"),
      ("big", "the dog and THE cat ran"),
      // small: fully inside big's vocab (oov 0 vs big)
      ("small", "the cat  sat"),
      // alien: zero overlap with either (the zero-overlap grid row)
      ("alien", "qx7 zz9 qx7"))
    assert(run(rows) == brute(rows))
  }

  test("occurrence and type shares diverge when only the head is covered") {
    // b covers ONLY a's head word "t" (6 of 8 occurrences, 1 of 3 types):
    // oov_occ_milli = 250, oov_type_milli = 666 — the table's whole point.
    val rows = Seq(("a", "t t t t t t u v"), ("b", "t w"))
    val out = run(rows)
    val ab = out.find(r => r._1 == "a" && r._2 == "b").get
    assert(ab == ("a", "b", 2L, 2L, 250L, 666L))
  }

  test("fixture: grid is the full ordered-pair set; shares within [0,1000]") {
    val out = q198.run(spark, "/root/testdata/sf0.001").collect()
    val sources = out.map(_.getString(0)).toSet ++ out.map(_.getString(1)).toSet
    assert(out.length == sources.size * (sources.size - 1))
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000)
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
    TextMining.release(spark)
  }
}
