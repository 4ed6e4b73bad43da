package graft.llm

import graft.SparkSpec

/** q231's funnel laws — every stage only removes: docs and tokens are
  * non-increasing down the stages, stage 0 equals the raw corpus,
  * stage order and names are the published contract, and the budget
  * stage respects the per-source cap by construction (each source's
  * kept tokens ≤ CurationBudget). */
class CurationFunnelSpec extends SparkSpec {

  private def funnel(dir: String) =
    LlmText.curationFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("stages are ordered, named, and monotone non-increasing") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val f = funnel(dir)
      assert(f.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
      assert(f.map(_._2).toSeq ==
        Seq("corpus", "quality", "exact_dedup", "decontaminate", "budget"))
      f.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._1} grew: $a -> $b")
      }
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      assert(f(0)._3 == nDocs, "stage 0 must census the raw corpus")
    }
  }

  test("budget stage: every source's kept tokens within CurationBudget") {
    val f = funnel("/root/testdata/sf0.01")
    val budgetTokens = f.last._4
    val nSources = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("source").distinct().count()
    assert(budgetTokens <= nSources * LlmText.CurationBudget,
      s"total kept tokens $budgetTokens exceed ${nSources} x ${LlmText.CurationBudget}")
  }
}
