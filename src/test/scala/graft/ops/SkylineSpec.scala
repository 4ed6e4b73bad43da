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

  test("degenerate: all prices inside ONE grid cell — prune admits everything, exact pass still exact") {
    // 200 points, every price in [100, 999] cents: pc div 1000 == 0
    // for every row, so every ub == 1000 and NO row is pruned — the
    // adversarially flat distribution the fixed cell cannot thin.
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map { i =>
      (i, 100L + rnd.nextInt(900), 1L + rnd.nextInt(50)) }
    val p = frame(pts)
    // prune really is a no-op here: candidate count == input count
    val bnd = p.groupBy(col("sz").as("j")).agg(min(expr("pc div 1000")).as("ci"))
    assert(bnd.agg(max("ci")).first().getLong(0) == 0L)
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
