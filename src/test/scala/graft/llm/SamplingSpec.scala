package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q68/q75 sampling hash must actually MIX: one MINSTD step never
  * wraps the modulus for doc_id < 44k, leaving the "hash" monotone in
  * doc_id — every fixture doc then lands below any acceptance
  * threshold and rate-sampling silently keeps everything (and the
  * oracle, sharing the formula, still passes). These pins fail on any
  * regression to a non-wrapping formula. */
class SamplingSpec extends SparkSpec {

  private def hashes(n: Int): Seq[Long] = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
      .select(LlmText.lehmer3(col("doc_id")).as("hk"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("lehmer3 is not monotone over small ids (the degenerate failure shape)") {
    val hk = hashes(500)
    val inversions = hk.sliding(2).count { case Seq(a, b) => b < a; case _ => false }
    assert(inversions > 100, s"only $inversions inversions in 500 — hash is near-monotone")
  }

  test("lehmer3 rate thresholds select ~the asked fraction") {
    val hk = hashes(10000)
    for (rate <- Seq(0.1, 0.5, 0.9)) {
      val kept = hk.count(_.toDouble < rate * 2147483647.0).toDouble / hk.size
      assert(math.abs(kept - rate) < 0.03,
        s"rate $rate kept $kept — threshold sampling is biased")
    }
  }

  test("lehmer3 stays within [0, 2^31-1) and is collision-light on 10k ids") {
    val hk = hashes(10000)
    assert(hk.forall(h => h >= 0 && h < 2147483647L))
    assert(hk.distinct.size > 9990, s"${10000 - hk.distinct.size} collisions in 10k")
  }
}
