package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q83's greedy keep-first verdict, checked against its own DEFINITION
  * (not the oracle's formulation): a vector is dropped iff some
  * lower-id vector in the SAME cluster is within the threshold. The
  * check recomputes cluster assignment and pairwise cosine naively on
  * the driver from the fixture — O(n·k + Σ|c|²) on 500 rows — and
  * compares verdicts row by row. This pins the kernel wiring (pivot
  * normalization, tie-breaks, PairCosine triangle enumeration,
  * dup-side projection) independently of DuckDB. */
class SemanticDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("verdict matches the naive keep-first definition on the fixture") {
    val out = LlmVector.semanticDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), (r.getAs[Long]("cluster"), r.getAs[Boolean]("keep"))))
      .toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); if (n == 0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val pivots = vecs.take(8).map(p => unit(p._2))
    def cluster(v: Array[Double]): Long = {
      val dots = pivots.map(dot(v, _))
      dots.indices.maxBy(i => (dots(i), -i.toDouble)).toLong
    }
    def cos(a: Array[Double], b: Array[Double]) = {
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      dot(a, b) / (na * nb)
    }
    val cl = vecs.map { case (id, v) => id -> cluster(v) }.toMap
    val byId = vecs.toMap
    vecs.foreach { case (id, v) =>
      val (gotCl, gotKeep) = out(id)
      assert(gotCl == cl(id), s"vec $id: cluster $gotCl != naive ${cl(id)}")
      val expectDrop = vecs.exists { case (lo, lv) =>
        lo < id && cl(lo) == cl(id) && cos(lv, v) >= 0.45
      }
      assert(gotKeep == !expectDrop, s"vec $id: keep=$gotKeep, naive drop=$expectDrop")
    }
    assert(out.size == vecs.length)
    LlmVector.release(spark)
  }
}
