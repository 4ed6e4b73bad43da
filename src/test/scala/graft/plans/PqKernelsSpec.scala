package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PQ kernels must be bit-identical to an independent scalar
  * reimplementation of the contract (unit-normalize → per-subspace
  * argmin-L2; LUT sum), total on dirty rows, and deterministic on
  * codeword ties. */
class PqKernelsSpec extends SparkSpec {

  // 2 subspaces × 2 dims, 3 codewords each — small enough to hand-check
  private val books: Array[Array[Array[Double]]] = Array(
    Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.5, 0.5)),
    Array(Array(0.6, 0.8), Array(0.6, 0.8), Array(-1.0, 0.0)))

  private def refEncode(emb: Array[Float]): Seq[Int] = {
    val dim = 4
    val v = new Array[Double](dim)
    emb.take(dim).map(_.toDouble).copyToArray(v)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    val u = if (nrm == 0) v else v.map(_ / nrm)
    books.indices.map { m =>
      val d = books(m).map(c => (0 until 2).map { k =>
        val t = u(m * 2 + k) - c(k); t * t }.sum)
      d.indexOf(d.min)
    }
  }

  test("encode matches the scalar reference; ties keep the lowest codeword id") {
    import spark.implicits._
    val rows = Seq(
      Array(3f, 4f, 0.6f, 0.8f),   // subspace 1 ties codewords 0 and 1 → 0
      Array(1f, 0f, -2f, 0f),
      Array(0f, 0f, 0f, 0f),       // zero vector: norm guard, codeword by raw L2
      Array(-1f, 2f, 5f, -3f))
    val got = rows.toDF("emb")
      .select(PqKernels.encode(col("emb").cast("array<float>"), books).as("c"))
      .collect().map(_.getSeq[Int](0).toSeq)
    rows.zip(got).foreach { case (r, g) =>
      assert(g == refEncode(r), s"encode diverged on ${r.toSeq}") }
    // the tie row really is a tie, and it broke low
    assert(got(0)(1) == 0)
  }

  test("adc score sums the per-subspace LUT cells of the codes") {
    import spark.implicits._
    val lut = Array(Array(0.1, 0.2, 0.3), Array(10.0, 20.0, 30.0))
    val got = Seq(Seq(0, 2), Seq(2, 0), Seq(1, 1)).toDF("codes")
      .select(PqKernels.adc(col("codes"), lut).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.1 + 30.0, 0.3 + 10.0, 0.2 + 20.0))
  }

  test("totality: null array → null; null elements read as 0; short rows zero-pad") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq[Option[Float]](Some(3f), None, Some(0.6f), Some(0.8f))))
      .toDF("emb")
      .select(PqKernels.encode(col("emb").cast("array<float>"), books).as("c"))
    assert(df.collect()(0).getSeq[Int](0) ==
      refEncode(Array(3f, 0f, 0.6f, 0.8f)).toSeq)
    val nullRow = spark.sql("SELECT cast(null as array<float>) AS emb")
      .select(PqKernels.encode(col("emb"), books).as("c")).collect()
    assert(nullRow(0).isNullAt(0))
    val short = Seq(Tuple1(Seq(3f, 4f))).toDF("emb")
      .select(PqKernels.encode(col("emb").cast("array<float>"), books).as("c"))
    assert(short.collect()(0).getSeq[Int](0) ==
      refEncode(Array(3f, 4f, 0f, 0f)).toSeq)
  }
}
