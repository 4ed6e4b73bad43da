package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LlmText.containmentPairs]] pins: the rarest-prefix candidate
  * scheme is COMPLETE against the brute-force directional containment
  * (including the small-doc-inside-big-doc pairs Jaccard candidates
  * miss by construction), thresholds are integer-exact at the 0.9
  * boundary, and the minShingles floor holds. */
class ContainmentSpec extends SparkSpec {

  private def dshOf(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "sh")
  }

  private def brute(dsh: org.apache.spark.sql.DataFrame,
                    minShingles: Int = 10): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val d = dsh.select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n"))
      .filter(col("n") >= minShingles)
    d.as("x").join(d.as("y"), col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        size(array_intersect(col("x.sh"), col("y.sh"))).cast("long").as("inter"),
        col("x.n").as("size_a"))
      .filter(col("inter") * 10 >= col("size_a") * 9)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("subset pair surfaces in BOTH directions' truth but only the contained side passes") {
    // A (20 shingles) fully inside B (100 shingles): c(A→B)=1 must
    // surface; c(B→A)=0.2 must not. C at exactly 17/20 = 0.85 < 0.9
    // stays out; D at 18/20 = 0.9 is ON the boundary and stays in.
    val a = (1L to 20L)
    val dsh = dshOf(Seq(
      1L -> a, 2L -> (1L to 100L),
      3L -> ((1L to 17L) ++ Seq(201L, 202L, 203L)),
      4L -> ((1L to 18L) ++ Seq(301L, 302L))))
    val out = LlmText.containmentPairs(dsh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(out == brute(dsh))
    val pairs = out.map(t => (t._1, t._2))
    assert(pairs.contains((1L, 2L)), "contained-in pair missed")
    assert(!pairs.contains((2L, 1L)), "direction confused: big doc is not contained in small")
    assert(!pairs.contains((3L, 1L)) && !pairs.contains((3L, 2L)), "0.85 leaked past the 0.9 gate")
    assert(pairs.contains((4L, 1L)) && pairs.contains((4L, 2L)), "exact-0.9 boundary dropped")
  }

  test("minShingles floors the denominator") {
    val dsh = dshOf(Seq(1L -> Seq(1L, 2L), 2L -> (1L to 50L)))
    assert(LlmText.containmentPairs(dsh).count() == 0,
      "a 2-shingle doc must not produce containment pairs")
  }

  test("fixture equality with brute force at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dsh = LlmText.docShingles(spark, dir)
      val out = LlmText.containmentPairs(dsh).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      assert(out == brute(dsh), s"prefix scheme diverged from brute force on $dir")
      assert(out.nonEmpty, s"fixture $dir should contain containment pairs (clone docs)")
    }
    LlmText.release(spark)
  }
}
