package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q225's interpolated Kneser–Ney scorer ([[LlmText.knScore]]) against
  * a direct Scala reference on a hand-checkable fixture exercising
  * every probability arm: seen bigram, seen context + unseen
  * continuation, unseen context (full backoff), and a bigram-free doc
  * (absent from output, like q82). */
class KnPerplexitySpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, token-id array). Train split = doc_id % 5 <> 0.
  private val fixture: Seq[(Long, Seq[Long])] = Seq(
    1L -> Seq(1L, 2L, 3L, 2L, 3L), // train
    2L -> Seq(1L, 2L, 2L),         // train
    3L -> Seq(7L),                 // train, no bigrams
    5L -> Seq(1L, 2L, 9L),         // test: seen bigram + unseen w2
    10L -> Seq(9L, 1L))            // test: unseen context

  private def reference(rows: Seq[(Long, Seq[Long])]): Map[Long, (Long, Double)] = {
    val bigs = rows.flatMap { case (d, hs) => hs.sliding(2).collect {
      case Seq(a, b) => (d, a, b) } }
    val train = bigs.filter(_._1 % 5 != 0)
    val c2 = train.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(g =>
      (g.values.sum, g.size.toLong)).toMap
    val bwd = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = c2.size.toLong
    val vb = bwd.size.toLong
    def pc(w2: Long) = (bwd.getOrElse(w2, 0L) + 1).toDouble / (b + vb + 1)
    def t(w1: Long, w2: Long): Double = c1.get(w1) match {
      case Some((nc, n1f)) =>
        val disc = math.max(c2.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0)
        -math.log((disc + (0.75 * n1f) * pc(w2)) / nc)
      case None => -math.log(pc(w2))
    }
    bigs.groupBy(_._1).map { case (d, bs) =>
      val mean = bs.map(x => t(x._2, x._3)).sum / bs.size
      d -> (bs.size.toLong,
        BigDecimal(mean).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("knScore equals the direct reference on every arm") {
    val tha = fixture.toDF("doc_id", "hs")
    val got = LlmText.knScore(tha).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = reference(fixture)
    assert(got == want)
    // the bigram-free doc must be absent, the backoff doc present
    assert(!got.contains(3L) && got.contains(10L))
  }

  test("hand value: doc 5 = mean(-ln .839285…, -ln .0714285…) ≈ 1.41") {
    val tha = fixture.toDF("doc_id", "hs")
    val r = LlmText.knScore(tha).filter(col("doc_id") === 5).collect()(0)
    assert(r.getLong(1) == 2L && r.getDouble(2) == 1.41)
  }
}
