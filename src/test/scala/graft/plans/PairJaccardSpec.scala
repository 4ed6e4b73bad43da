package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential validation of the blocked exact-Jaccard kernel against
  * the shared-shingle join + array_intersect formulation it replaced
  * (the rounds-2–6 q39 plan, itself oracle-validated). */
class PairJaccardSpec extends SparkSpec {

  private def docShingles(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        TextKernels.shingleSet(TextKernels.tokenHashes(lower(col("text")))).as("sh"))
      .filter(size(col("sh")) > 0)

  /** The retained relational formulation: candidates from the shared-
    * shingle self-join, verified with array_intersect. */
  private def relationalPairs(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("sh"))
    val cands = ex.as("x").join(ex.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
  }

  private def blockedPairs(docs: DataFrame, nBlocks: Int): DataFrame = {
    val blocks = docs
      .select(pmod(col("doc_id"), lit(nBlocks)).as("g"),
        struct(col("doc_id"), sort_array(col("sh"))).as("ds"))
      .groupBy("g").agg(collect_list(col("ds")).as("vs"))
    blocks.as("x").join(blocks.as("y"), col("x.g") <= col("y.g"))
      .select(explode(PairJaccard.pairs(
        col("x.vs"), col("y.vs"), col("x.g") === col("y.g"), 1, 2)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.inter").as("inter"), col("p.uni").as("uni"))
  }

  test("blocked kernel == shared-shingle-join formulation on both fixtures") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = docShingles(dir)
      val rel = relationalPairs(docs)
      for (nb <- Seq(1, 8)) {
        val blk = blockedPairs(docs, nb)
        assert(blk.exceptAll(rel).isEmpty && rel.exceptAll(blk).isEmpty,
          s"blocked Jaccard pairs (nBlocks=$nb) diverge from relational at $dir")
      }
    }
  }

  test("threshold is integer-exact and inclusive; empty sets never pair") {
    import spark.implicits._
    // sh sets: 0-1 share 2 of 3 (J=1/2, kept, inclusive bound);
    // 2 shares 1 of 4 with 0 (J=1/4, dropped); 3 is empty (no pairs).
    val docs = Seq(
      (0L, Seq(1L, 2L, 3L)),
      (1L, Seq(2L, 3L)),      // inter 2, uni 3 -> 2*2 >= 3 kept
      (2L, Seq(1L, 9L)),      // with 0: inter 1, uni 4 -> dropped
      (3L, Seq.empty[Long])
    ).toDF("doc_id", "sh")
    val out = blockedPairs(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(out == Set((0L, 1L, 2, 3)))
  }
}
