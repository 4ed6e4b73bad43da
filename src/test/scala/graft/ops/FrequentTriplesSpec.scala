package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Graph.frequentTriples]] pins: the Apriori-pruned enumeration
  * equals brute C(n,3) triple counting (anti-monotonicity makes the
  * pruning a theorem — this spec checks the implementation honors
  * it), the support boundary is exact, and a triple whose sub-pairs
  * are frequent but whose own support is below threshold is
  * generated-then-rejected, not silently kept. */
class FrequentTriplesSpec extends SparkSpec {

  private def itemsOf(baskets: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    baskets.flatMap { case (k, ps) => ps.distinct.map(k -> _) }.toDF("k", "p")
  }

  private def brute(baskets: Seq[(Long, Seq[Long])],
                    minSup: Int): Seq[(Long, Long, Long, Long)] =
    baskets.flatMap { case (_, ps) =>
      ps.distinct.sorted.combinations(3).map(c => (c(0), c(1), c(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((a, b, c), n) if n >= minSup => (a, b, c, n) }
      .sorted

  private def run(baskets: Seq[(Long, Seq[Long])], minSup: Int) =
    Graph.frequentTriples(itemsOf(baskets), minSup).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("equals brute enumeration on adversarial baskets; boundary exact") {
    // triple (1,2,3) at support exactly 3 (= minSup, stays); (1,2,4)
    // at support 2 with ALL sub-pairs frequent (candidate generated,
    // rejected on true support); big overlapping baskets for noise
    val baskets = Seq[(Long, Seq[Long])](
      1L -> Seq[Long](1, 2, 3, 4), 2L -> Seq[Long](1, 2, 3), 3L -> Seq[Long](1, 2, 3, 9),
      4L -> Seq[Long](1, 2, 4), 5L -> Seq[Long](2, 3, 4), 6L -> Seq[Long](1, 3, 4),
      7L -> (10L to 30L), 8L -> (20L to 40L), 9L -> (10L to 25L),
      10L -> Seq[Long](1, 9, 30))
    for (minSup <- Seq(2, 3)) {
      assert(run(baskets, minSup) == brute(baskets, minSup),
        s"pruned enumeration diverged from brute force at minSup=$minSup")
    }
    val at3 = run(baskets, 3).map(t => (t._1, t._2, t._3))
    assert(at3.contains((1L, 2L, 3L)), "support == minSup boundary dropped")
    assert(!at3.contains((1L, 2L, 4L)),
      "sub-pair-frequent triple below true support leaked through")
  }

  test("sliced pair stage equals direct across the size threshold") {
    // one basket ABOVE the tiling threshold (the mega-basket hedge
    // path), several below it, overlapping parts so cross-basket
    // pair supports mix both branches; then the same check with the
    // threshold forced to 0 (EVERY basket tiled) so tile assignment
    // is exercised on the small baskets too
    val baskets = Seq[(Long, Seq[Long])](
      1L -> (1L to 50L), 2L -> (20L to 45L), 3L -> (40L to 60L),
      4L -> Seq[Long](1, 2, 3), 5L -> Seq[Long](2, 3, 44))
    val items = itemsOf(baskets)
    def counts(threshold: Int, slices: Int) =
      Graph.pairCounts(items, threshold, slices).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val direct = counts(Int.MaxValue, 16)
    assert(counts(30, 4) == direct, "tiled mega-basket branch diverged")
    assert(counts(0, 4) == direct, "all-tiled pair stage diverged")
    assert(counts(30, 1) == direct, "degenerate single-slice tiling diverged")
  }

  test("empty when no pair reaches support") {
    val baskets = Seq[(Long, Seq[Long])](
      1L -> Seq[Long](1, 2, 3), 2L -> Seq[Long](4, 5, 6), 3L -> Seq[Long](7, 8, 9))
    assert(run(baskets, 2).isEmpty)
  }
}
