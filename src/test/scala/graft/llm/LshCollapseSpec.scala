package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Differential pin for the shingle-class collapse in lshPairs: the
  * collapsed formulation must produce EXACTLY the doc-level band-join
  * + per-pair-verify pair set (verifiedPairs is kept as that reference
  * shape) — on the fixture AND on a clone-heavy corpus, which is the
  * input shape the collapse exists for (and the only one with
  * within-class emissions). */
class LshCollapseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def referencePairs(docs: DataFrame): Set[(Long, Long, Int, Int)] =
    asSet(LlmText.docLevelPairs(docs))

  private def asSet(df: DataFrame): Set[(Long, Long, Int, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  test("collapsed classPairs == doc-level band join + per-pair verify (fixture)") {
    // call classPairs DIRECTLY: the adaptive pick in lshPairs routes
    // the mostly-distinct fixture to the doc-level path, which would
    // make a lshPairs-vs-reference compare trivially true
    val docs = LlmText.docShingles(spark, dir)
    val got = asSet(LlmText.classPairs(docs))
    val want = referencePairs(docs)
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(got == want,
      s"collapse diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    LlmText.release(spark)
  }

  test("collapsed classPairs == reference on a clone-heavy corpus (both emit paths)") {
    val docs = LlmText.docShingles(spark, dir).filter(col("doc_id") < 100)
    // three copies of every doc under distinct ids: every class has
    // clones, and the fixture's near-dups appear 9x across clone pairs
    val cloned = (0 to 2).map(i =>
        docs.select((col("doc_id") + i * 1000L).as("doc_id"), col("sh")))
      .reduce(_ unionAll _)
    val got = asSet(LlmText.classPairs(cloned))
    val want = referencePairs(cloned)
    assert(got == want,
      s"collapse diverged on clones: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.exists { case (_, _, i, u) => i == u }, "no within-class (exact-dup) pair")
    assert(got.exists { case (_, _, i, u) => i != u }, "no cross-class (near-dup) pair")
    LlmText.release(spark)
  }
}
