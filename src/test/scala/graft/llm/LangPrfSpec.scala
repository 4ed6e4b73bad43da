package graft.llm

import graft.SparkSpec

/** Gate for q192's per-class precision/recall/F1: the class table must
  * match a Scala brute force of the confusion marginals on a hand
  * corpus that includes a class with perfect recall but imperfect
  * precision, a class absent from predictions, and a class absent
  * from declarations; and its diagonal must reconcile with q174. */
class LangPrfSpec extends SparkSpec {

  private val q192 = graft.SparkEntry.all.find(_.name == "q192_langid_prf").get
  private val q174 = graft.SparkEntry.all.find(_.name == "q174_langid_agreement").get

  private def detect(text: String): String = {
    val t = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val profiles = Seq(
      "en" -> Set("the", "a", "of", "and", "in"),
      "de" -> Set("der", "die", "und", "das", "ist"),
      "es" -> Set("el", "la", "y", "los", "que"),
      "fr" -> Set("le", "les", "et", "des", "un"))
    val scores = profiles.map { case (l, ws) => l -> t.count(ws) }
    scores.find(_._2 == scores.map(_._2).max).get._1
  }

  private def brute(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val labs = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    labs.map { lab =>
      val nTrue = rows.count(_._1 == lab).toLong
      val nPred = rows.count(_._2 == lab).toLong
      val tp = rows.count(r => r._1 == lab && r._2 == lab).toLong
      (lab, nTrue, nPred, tp,
        if (nPred == 0) -1L else 1000L * tp / nPred,
        if (nTrue == 0) -1L else 1000L * tp / nTrue,
        if (nTrue + nPred == 0) -1L else 2000L * tp / (nTrue + nPred))
    }
  }

  test("matches the brute-force marginals incl. one-sided classes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prf").toString
    val en = "the cat of and in"; val de = "der die und das ist"
    val es = "el la y los que"
    val rows = Seq(
      // en: 2 correct + 1 de-declared doc detected en -> precision < 1
      ("en", en), ("en", en), ("de", en),
      // es declared but detected es (perfect small class)
      ("es", es),
      // fr declared, detected de: fr never predicted (n_pred 0)
      ("fr", de))
    rows.zipWithIndex.map { case ((lang, t), i) =>
      (i.toLong, t, lang, "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = rows.map { case (lang, t) => (lang, detect(t)) }
    val expect = brute(pairs)
    val out = q192.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    assert(out.toSeq == expect, s"got ${out.toSeq}\nexpected $expect")
    LlmText.release(spark)
  }

  test("fixture: diagonal reconciles with q174's match total, bounds hold") {
    val dir = "/root/testdata/sf0.001"
    val matches174 = q174.run(spark, dir).collect().map(_.getLong(3)).sum
    val out = q192.run(spark, dir).collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sum == matches174)
    out.foreach { case (nt, np, tp) => assert(tp <= math.min(nt, np)) }
    // both marginals partition the corpus
    assert(out.map(_._1).sum == out.map(_._2).sum)
    LlmText.release(spark)
  }
}
