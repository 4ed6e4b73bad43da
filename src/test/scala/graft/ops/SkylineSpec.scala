package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The grid prune is an optimization, never a correctness input: the
  * skyline must be exact for ANY price distribution, including the
  * degenerate one where every price lands inside one 1000-cent grid
  * cell and the prune admits everything (VERDICT r10 robustness
  * item — the fixed cell width controls prune RATE, not the answer). */
class SkylineSpec extends SparkSpec {

  /** O(n²) reference: point a survives iff no b with (pc ≤, sz ≥) and
    * one strict. */
  private def brute(p: DataFrame): Set[(Long, Long, Long)] = {
    val rows = p.select("p_partkey", "pc", "sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.filter { case (_, pc, sz) =>
      !rows.exists { case (_, pc2, sz2) =>
        pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz) }
    }.toSet
  }

  private def run(p: DataFrame): Set[(Long, Long, Long)] =
    Analytics.skyline(p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def frame(pts: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    pts.toDF("p_partkey", "pc", "sz")
  }

  test("flat distribution inside ONE fixed 1000-cent cell — adaptive cells restore the prune, result exact") {
    // 200 points, every price in [100, 999] cents: the OLD fixed grid
    // (pc div 1000) put every row in cell 0 and admitted 100% of the
    // input; the adaptive quantile cells split the same range into
    // ~64 equal-mass cells, so the prune must actually thin here
    // while the answer stays the brute-force frontier.
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map { i =>
      (i, 100L + rnd.nextInt(900), 1L + rnd.nextInt(50)) }
    val p = frame(pts)
    val nCand = Analytics.skylineCandidates(p).count()
    assert(nCand < 200L, s"adaptive prune admitted all $nCand rows on the flat fixture")
    assert(run(p) == brute(p))
  }

  test("degenerate: ALL prices equal — cuts collapse to one value, prune admits everything, exact pass still exact") {
    // the adaptive grid's own worst case: every quantile is the same
    // value, the distinct cut list has one element, every point lands
    // in the top cell (ub = +inf) and nothing is pruned — correctness
    // must come entirely from the exact windowed pass (max-size ties
    // all kept, everything else dominated).
    val pts = (1L to 100L).map { i => (i, 500L, 1L + i % 10) }
    val p = frame(pts)
    assert(Analytics.skylineCandidates(p).count() == 100L)
    assert(run(p) == brute(p))
  }

  test("spread distribution: grid-pruned result equals brute force") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map { i =>
      (i, 1000L + rnd.nextInt(2000000), 1L + rnd.nextInt(50)) }
    val p = frame(pts)
    assert(run(p) == brute(p))
  }

  test("tie semantics: equal (pc, sz) points never dominate each other — all kept") {
    val p = frame(Seq((1L, 500L, 10L), (2L, 500L, 10L), (3L, 500L, 10L),
      (4L, 400L, 5L), (5L, 600L, 20L)))
    val got = run(p)
    assert(got == brute(p))
    assert(Set(1L, 2L, 3L).subsetOf(got.map(_._1)))
  }

  test("single point and empty input") {
    assert(run(frame(Seq((1L, 5L, 5L)))) == Set((1L, 5L, 5L)))
    assert(run(frame(Seq.empty)) == Set.empty)
  }
}
