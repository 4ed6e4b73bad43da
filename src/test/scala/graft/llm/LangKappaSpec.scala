package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q191's chance-corrected label agreement: per-source
  * Cohen's kappa in integer milli must match a BigInt brute force of
  * the confusion-matrix formula on a hand corpus built to include
  * above-chance, below-chance (negative kappa), and majority-class
  * sources; and q191's match counts must reconcile with q174's
  * agreement table on the fixture. */
class LangKappaSpec extends SparkSpec {

  private val q191 = graft.SparkEntry.all.find(_.name == "q191_langid_kappa").get
  private val q174 = graft.SparkEntry.all.find(_.name == "q174_langid_agreement").get

  /** The q174 stopword detector: greatest hit count, profile order
    * en > de > es > fr breaks ties. */
  private def detect(text: String): String = {
    val t = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val profiles = Seq(
      "en" -> Set("the", "a", "of", "and", "in"),
      "de" -> Set("der", "die", "und", "das", "ist"),
      "es" -> Set("el", "la", "y", "los", "que"),
      "fr" -> Set("le", "les", "et", "des", "un"))
    val scores = profiles.map { case (l, ws) => l -> t.count(ws) }
    val best = scores.map(_._2).max
    scores.find(_._2 == best).get._1
  }

  private def kappaMilli(pairs: Seq[(String, String)]): Long = {
    val n = BigInt(pairs.size)
    val diag = BigInt(pairs.count { case (a, b) => a == b })
    val rows = pairs.groupBy(_._1).view.mapValues(p => BigInt(p.size)).toMap
    val cols = pairs.groupBy(_._2).view.mapValues(p => BigInt(p.size)).toMap
    val sv = rows.map { case (lab, rc) => rc * cols.getOrElse(lab, BigInt(0)) }.sum
    ((BigInt(1000) * (n * diag - sv)) / (n * n - sv)).toLong
  }

  test("matches the BigInt kappa on above-chance, below-chance, and skewed sources") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kappa").toString
    val en = "the cat of and in"; val de = "der die und das ist"
    val es = "el la y los que"; val fr = "le les et des un"
    val rows = Seq(
      // s1: perfect agreement across two classes -> kappa 1000
      ("s1", "en", en), ("s1", "en", en), ("s1", "de", de), ("s1", "de", de),
      // s2: systematic disagreement -> negative kappa
      ("s2", "en", de), ("s2", "en", de), ("s2", "de", en), ("s2", "de", en),
      // s3: majority-class flattery — declared all-en, detector mixed
      ("s3", "en", en), ("s3", "en", en), ("s3", "en", en), ("s3", "en", de))
    rows.zipWithIndex.map { case ((src, lang, t), i) =>
      (i.toLong, t, lang, src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val expect = rows.groupBy(_._1).view.mapValues(ds =>
      kappaMilli(ds.map(d => (d._2, detect(d._3))))).toMap
    val out = q191.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == expect, s"got $out\nexpected $expect")
    assert(out("s1") == 1000L && out("s2") < 0L)
    LlmText.release(spark)
  }

  test("fixture: kappa match counts reconcile with q174's agreement table") {
    val dir = "/root/testdata/sf0.001"
    val agg174 = q174.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    val out = q191.run(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out == agg174, s"got $out\nexpected $agg174")
    out.values.foreach { case (n, m) => assert(m <= n) }
    LlmText.release(spark)
  }
}
