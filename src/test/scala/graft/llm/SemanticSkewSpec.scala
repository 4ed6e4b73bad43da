package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q83's skew cap: the per-cluster sub-block matrix must enumerate the
  * SAME dup set as the single-block triangle — fixture clusters sit
  * under the production cap, so this spec forces a tiny cap to drive
  * the multi-block path explicitly. */
class SemanticSkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dups(cap: Int): (Set[Long], Long) = {
    val asg = LlmVector.semanticAssign(spark, dir)
    val sizes = asg.groupBy("cluster").agg(count(lit(1)).as("csize"))
    val blocks = LlmVector.skewCappedBlocks(asg, sizes, cap)
    try {
      val d = blocks.as("x").join(blocks.as("y"),
          col("x.cluster") === col("y.cluster") && col("x.sub") <= col("y.sub"))
        .select(explode(graft.plans.PairCosine.pairs(
          col("x.vs"), col("y.vs"), col("x.sub") === col("y.sub"), 0.45)).as("p"))
        .select(col("p.vec_b")).distinct()
        .collect().map(_.getLong(0)).toSet
      (d, blocks.count())
    } finally { blocks.unpersist(); () }
  }

  test("sub-blocked triangle == single-block triangle; cap actually splits") {
    val (single, nSingle) = dups(Int.MaxValue)
    val (multi, nMulti) = dups(16)
    assert(nMulti > nSingle, "cap=16 must split fixture clusters into sub-blocks")
    assert(multi == single,
      s"sub-blocking changed the dup set: missing=${(single -- multi).take(5)} " +
        s"extra=${(multi -- single).take(5)}")
    LlmVector.release(spark)
  }
}
