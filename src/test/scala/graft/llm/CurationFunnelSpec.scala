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

  // ---- q232, the FULL RefinedWeb composition (round 19) ----

  private def funnel7(dir: String) =
    LlmText.refinedFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("q232: seven stages ordered, named, monotone; shared prefix agrees with q231") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val f = funnel7(dir)
      assert(f.map(_._1).toSeq == (0L to 6L))
      assert(f.map(_._2).toSeq == Seq("corpus", "quality", "exact_dedup",
        "fuzzy_dedup", "substring_cut", "decontaminate", "budget"))
      f.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._1} grew: $a -> $b")
      }
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      assert(f(0)._3 == nDocs, "stage 0 must census the raw corpus")
      // stages 0–2 are exactly q231's rules — the two funnels must
      // agree row-for-row on the shared prefix
      val f5 = funnel(dir)
      assert(f.take(3).toSeq == f5.take(3).toSeq,
        s"shared prefix drifted: ${f.take(3).toSeq} vs ${f5.take(3).toSeq}")
      // the substring cut is a token-mass adjustment, never a doc drop
      assert(f(4)._3 == f(3)._3, "substring_cut changed the doc census")
      // decon applies to a never-larger set than q231's (fuzzy ran first)
      assert(f(5)._3 <= f5(3)._3)
    }
  }

  test("q232 budget stage: per-source net tokens within CurationBudget") {
    val f = funnel7("/root/testdata/sf0.01")
    val nSources = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("source").distinct().count()
    assert(f.last._4 <= nSources * LlmText.CurationBudget)
    // the fuzzy + substring stages must DISCRIMINATE on the standard
    // fixture (a funnel whose new stages are no-ops tests nothing)
    assert(f(3)._3 < f(2)._3, "fuzzy stage dropped nothing")
    assert(f(4)._4 < f(3)._4, "substring cut removed no tokens")
  }
}
