package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential validation of the blocked all-pairs cosine kernel
  * against the relational formulation it replaced (posexplode →
  * position join → codegen'd sum — the rounds-2–6 q50 plan, itself
  * oracle-validated), plus totality on dirty vectors. */
class PairCosineSpec extends SparkSpec {

  private val Threshold = 0.45

  /** The retained relational uncapped all-pairs formulation. */
  private def relationalPairs(emb: DataFrame): DataFrame = {
    val e = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
    val nrm = e.groupBy("vec_id").agg(sqrt(sum(col("v") * col("v"))).as("n"))
    e.as("a").join(e.as("b"),
        col("a.i") === col("b.i") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(sum(col("a.v") * col("b.v")).as("d"))
      .join(nrm.select(col("vec_id").as("vec_a"), col("n").as("na")), "vec_a")
      .join(nrm.select(col("vec_id").as("vec_b"), col("n").as("nb")), "vec_b")
      .filter(col("d") / (col("na") * col("nb")) >= Threshold)
      .select("vec_a", "vec_b")
  }

  private def blockedPairs(emb: DataFrame, nBlocks: Int): DataFrame = {
    val blocks = emb
      .select(pmod(col("vec_id"), lit(nBlocks)).as("g"),
        struct(col("vec_id"), col("embedding")).as("ve"))
      .groupBy("g").agg(collect_list(col("ve")).as("vs"))
    blocks.as("x").join(blocks.as("y"), col("x.g") <= col("y.g"))
      .select(explode(PairCosine.pairs(
        col("x.vs"), col("y.vs"), col("x.g") === col("y.g"), Threshold)).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"))
  }

  test("blocked kernel == relational all-pairs on both fixtures, any block count") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val rel = relationalPairs(emb)
      for (nb <- Seq(1, 3, 8)) {
        val blk = blockedPairs(emb, nb)
        assert(blk.exceptAll(rel).isEmpty && rel.exceptAll(blk).isEmpty,
          s"blocked pairs (nBlocks=$nb) diverge from relational at $dir")
      }
    }
  }

  test("every unordered pair enumerated exactly once (no dupes, a < b)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val blk = blockedPairs(emb, 8).collect()
    assert(blk.forall(r => r.getLong(0) < r.getLong(1)))
    assert(blk.map(r => (r.getLong(0), r.getLong(1))).distinct.length == blk.length)
  }

  test("dirty vectors stay total: NaN, zero norm, ragged, null elements") {
    import spark.implicits._
    val dirty = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 1e-6f, 0f)),          // cos ~1 with vec 0
      (2L, Array(0f, 0f, 0f)),             // zero norm -> NaN cos -> dropped
      (3L, Array(Float.NaN, 1f, 0f)),      // NaN dot -> dropped
      (4L, Array(1f, 0f))                  // ragged: dots over shorter prefix
    ).toDF("vec_id", "embedding")
    val out = blockedPairs(dirty, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((0L, 1L)))
    assert(!out.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    assert(out.contains((0L, 4L))) // prefix dot: cos 1 over shared dims
    val withNulls = spark.sql(
      """SELECT * FROM VALUES
        |  (0L, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))),
        |  (1L, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))
        |AS t(vec_id, embedding)""".stripMargin)
    val np = blockedPairs(withNulls, 1).collect()
    assert(np.length == 1) // null element reads as 0; cos = 1
  }
}
