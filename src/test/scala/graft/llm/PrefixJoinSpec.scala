package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Differential gate for [[LlmText.prefixJaccardPairs]] (q124): the
  * prefix-filtered exact join must equal an in-spec brute-force
  * all-pairs Jaccard ≥ 0.5 reference on (a) a synthetic corpus with
  * planted near-dups at various overlap levels including pairs just
  * above and just below the threshold, and (b) a clone-heavy corpus
  * (every doc duplicated K×) — the workload where the class collapse
  * carries the load and within-class expansion must emit every clone
  * pair exactly once with inter = uni = |sh|. */
class PrefixJoinSpec extends SparkSpec {

  private def brute(docs: Seq[(Long, Set[Long])]): Seq[(Long, Long, Long, Long, Long)] =
    (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size
      uni = sa.size + sb.size - inter
      if inter * 2 >= uni
    } yield (a, b, inter.toLong, uni.toLong, 1000L * inter / uni)).sorted

  private def run(docs: Seq[(Long, Set[Long])]): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df: DataFrame = docs.map { case (id, sh) => (id, sh.toSeq.sorted) }
      .toDF("doc_id", "sh")
    LlmText.prefixJaccardPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
  }

  // deterministic synthetic: base sets plus controlled-overlap variants
  private def synth: Seq[(Long, Set[Long])] = {
    val rnd = new scala.util.Random(42)
    val bases = (0 until 40).map { i =>
      (100L + i, Set.fill(20)(rnd.nextLong(10000)).take(18))
    }
    val variants = bases.take(10).zipWithIndex.flatMap { case ((id, s), i) =>
      val v = s.toSeq.sorted
      Seq(
        // near-exact dup (drop 1 element): J well above 0.5
        (1000L + i, v.drop(1).toSet),
        // half overlap: right at/near the threshold boundary
        (2000L + i, (v.take(v.size / 2) ++ Seq.tabulate(v.size - v.size / 2)(k => 90000L + i * 100 + k)).toSet),
        // small overlap: below threshold, must NOT appear
        (3000L + i, (v.take(3) ++ Seq.tabulate(15)(k => 80000L + i * 100 + k)).toSet))
    }
    bases ++ variants
  }

  test("prefix join equals brute force on planted near-dups around the threshold") {
    val docs = synth
    val got = run(docs)
    val want = brute(docs)
    assert(want.nonEmpty, "fixture must plant pairs at J >= 0.5")
    assert(want.exists(_._5 < 1000), "fixture must plant non-identical pairs")
    assert(got == want)
  }

  test("clone-heavy corpus: identical to brute force, clone pairs exact") {
    val k = 5
    val base = synth.take(25)
    val docs = base.flatMap { case (id, s) =>
      (0 until k).map(c => (id + 100000L * c, s))
    }
    val got = run(docs)
    val want = brute(docs)
    assert(got == want)
    // every clone pair present with inter = uni = |sh| and J = 1000
    val cloneGroups = docs.groupBy(_._2).values.filter(_.size > 1)
    assert(cloneGroups.nonEmpty)
    val gotMap = got.map(t => (t._1, t._2) -> t).toMap
    for (g <- cloneGroups; pair <- g.map(_._1).sorted.combinations(2)) {
      val Seq(a, b) = pair
      val sz = g.head._2.size
      val t = gotMap.getOrElse((a, b), fail(s"clone pair ($a,$b) missing"))
      assert(t._3 == sz && t._4 == sz && t._5 == 1000L)
    }
  }
}
