package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q182's soft-dedup effective mass: on a clone-only corpus
  * the 1/cluster_size weighting must reproduce hard dedup's kept mass
  * exactly (k identical clones of nt tokens contribute k·(1e6·nt div k)
  * = 1e6·nt when k divides, and the truncation loss is bounded by k−1
  * micro-tokens); on the real fixture the structural invariants hold
  * and the cluster population reconciles with q57. */
class SoftDedupSpec extends SparkSpec {

  private val q182 = graft.SparkEntry.all.find(_.name == "q182_soft_dedup_mass").get
  private val q169 = graft.SparkEntry.all.find(_.name == "q169_dedup_yield").get

  test("clone-only corpus: soft mass equals one copy's mass exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("softdd").toString
    // 4 clones of a 10-token doc in source a; one unique 7-token doc in b
    val ta = (1 to 10).map(i => s"w$i").mkString(" ")
    val tb = (1 to 7).map(i => s"u$i").mkString(" ")
    (Seq((1L, ta, "a"), (2L, ta, "a"), (3L, ta, "a"), (4L, ta, "a"),
      (5L, tb, "b")))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q182.run(spark, dir).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // source a: 4 docs, 40 raw tokens, eff = 4 * (1e7 div 4) = 1e7
    // micro = exactly ONE copy's 10 tokens; soft yield = 250 milli
    assert(out("a") == ((4L, 40L, 10000000L, 250L)), out("a").toString)
    // source b: no cluster, eff = raw, yield 1000
    assert(out("b") == ((1L, 7L, 7000000L, 1000L)), out("b").toString)
    graft.llm.LlmText.release(spark)
  }

  test("fixture: invariants hold and totals reconcile with q169") {
    val dir = "/root/testdata/sf0.001"
    val soft = q182.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val hard = q169.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(soft.keySet == hard.keySet)
    for ((src, (nDocs, nTok, eff, yieldMilli)) <- soft) {
      val (hDocs, hTok, hNet) = hard(src)
      assert(nDocs == hDocs && nTok == hTok, s"$src raw totals disagree with q169")
      // soft keeps at most the raw mass, and at least SOME mass from
      // every cluster (hard dedup's floor does not hold in general:
      // a near-dup cluster whose kept representative is its longest
      // member can out-keep the 1/k average)
      assert(eff <= 1000000L * nTok, s"$src eff exceeds raw")
      assert(eff > 0L || nTok == 0L, s"$src lost all mass")
      assert(hNet >= 0L)
      assert(yieldMilli >= 0L && yieldMilli <= 1000L)
    }
    graft.llm.LlmText.release(spark)
  }
}
