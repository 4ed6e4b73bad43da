package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q120's fixture only exercises row REMOVAL; the operator's contract
  * is broader — this spec drives [[Audit.blockDiff]] over synthetic
  * snapshots covering the other shapes: identical snapshots diff to
  * EMPTY, an in-place value change flips exactly its block (counts
  * equal, fingerprints differ), an insertion surfaces as a count
  * mismatch, and a block present on only one side appears with zeroed
  * other-side columns. */
class BlockDiffSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, Long)]) =
    rows.toDF("block_id", "fp")

  test("identical snapshots produce an empty diff") {
    val a = frame(Seq((0L, 10L), (0L, 20L), (1L, 5L)))
    assert(Audit.blockDiff(a, frame(Seq((0L, 10L), (0L, 20L), (1L, 5L)))).count() == 0)
  }

  test("an in-place change flips exactly its block: counts equal, fingerprints differ") {
    val a = frame(Seq((0L, 10L), (1L, 5L)))
    val b = frame(Seq((0L, 11L), (1L, 5L)))
    val d = Audit.blockDiff(a, b).collect()
    assert(d.length == 1)
    assert(d(0).getLong(0) == 0L && d(0).getLong(1) == 1L && d(0).getLong(2) == 1L)
    assert(d(0).getLong(3) != d(0).getLong(4))
  }

  test("an insertion surfaces as a count mismatch; one-sided blocks zero-fill") {
    val a = frame(Seq((0L, 10L)))
    val b = frame(Seq((0L, 10L), (0L, 7L), (9L, 3L)))
    val d = Audit.blockDiff(a, b).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(d(0L) == (1L, 2L, 10L, 17L))
    assert(d(9L) == (0L, 1L, 0L, 3L))
  }
}
