package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q230's Naive-Bayes quality scorer ([[LlmText.nbScore]]) against a
  * direct Scala reference on a hand-checkable fixture: weak TTR
  * label, add-one smoothing, unseen-token and test-only-doc arms,
  * class prior. */
class NbQualitySpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, token ids). Train = doc_id % 5 <> 0.
  // doc 1: all distinct (label 1); doc 2: heavy repeats (label 0);
  // doc 5: test doc with a token unseen in train (9).
  private val fixture: Seq[(Long, Seq[Long])] = Seq(
    1L -> Seq(1L, 2L, 3L, 4L),
    2L -> Seq(1L, 1L, 1L, 2L, 2L, 2L),
    3L -> Seq(5L, 6L),
    5L -> Seq(1L, 9L, 9L, 9L, 9L, 9L))

  private def reference(rows: Seq[(Long, Seq[Long])]): Map[Long, (Long, Long, Double)] = {
    def label(hs: Seq[Long]) = if (2 * hs.distinct.size >= hs.size) 1L else 0L
    val train = rows.filter(_._1 % 5 != 0)
    val toks = train.flatMap { case (_, hs) => hs.map(_ -> label(hs)) }
    val c1 = toks.filter(_._2 == 1).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c0 = toks.filter(_._2 == 0).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (n1, n0) = (c1.values.sum, c0.values.sum)
    val v = (c1.keySet ++ c0.keySet).size.toLong
    val d1 = train.count(r => label(r._2) == 1).toLong
    val d0 = train.size - d1
    rows.map { case (d, hs) =>
      val s = hs.map(h =>
        math.log((c1.getOrElse(h, 0L) + 1).toDouble / (n1 + v)) -
          math.log((c0.getOrElse(h, 0L) + 1).toDouble / (n0 + v))).sum
      val llr = math.log(d1.toDouble / d0) + s
      d -> (label(hs), hs.size.toLong,
        BigDecimal(llr).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("nbScore equals the direct reference incl. unseen tokens and priors") {
    val got = LlmText.nbScore(fixture.toDF("doc_id", "hs")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == reference(fixture))
  }

  test("signs discriminate: the distinct-heavy doc scores above the repeat-heavy doc") {
    val got = LlmText.nbScore(fixture.toDF("doc_id", "hs")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(2L))
  }
}
