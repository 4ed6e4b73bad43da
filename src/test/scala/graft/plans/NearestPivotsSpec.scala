package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Unit pins for the IVF bucket-assignment expression: ordering,
  * tie-breaks, ragged inputs, nulls — through the real DataFrame path
  * (whole-stage codegen) so the doGenCode branch is what's exercised. */
class NearestPivotsSpec extends SparkSpec {

  // three unit pivots in 2-d: along x, along y, and at 37°
  private val pivots = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.6, 0.8))

  private def topN(vec: Seq[Float], n: Int): Seq[Int] = {
    import spark.implicits._
    val df = Seq(Tuple1(vec)).toDF("embedding")
    val c = GraftColumnBridge.column(
      NearestPivots(GraftColumnBridge.expression(col("embedding")), pivots, n))
    df.select(c.as("b")).head().getSeq[Int](0)
  }

  test("ranks pivots by dot product, best first") {
    assert(topN(Seq(1f, 0f), 3) == Seq(0, 2, 1)) // dots 1.0, 0.6, 0.0
    assert(topN(Seq(0f, 1f), 2) == Seq(1, 2))    // dots 0.0, 1.0, 0.8
  }

  test("ties break to the smaller pivot id") {
    // dots: p0 = 1, p1 = 1, p2 = 1.4 -> p2 first, then p0 before p1
    assert(topN(Seq(1f, 1f), 3) == Seq(2, 0, 1))
  }

  test("input shorter than the pivot dimension uses the shared prefix") {
    // only x contributes: dots 1.0, 0.0, 0.6
    assert(topN(Seq(1f), 3) == Seq(0, 2, 1))
  }

  test("null input stays null; n out of range rejected at construction") {
    import spark.implicits._
    val df = Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("embedding")
    val c = GraftColumnBridge.column(
      NearestPivots(GraftColumnBridge.expression(col("embedding")), pivots, 1))
    assert(df.select(c).head().isNullAt(0))
    intercept[IllegalArgumentException](
      NearestPivots(GraftColumnBridge.expression(col("embedding")), pivots, 4))
    intercept[IllegalArgumentException](
      NearestPivots(GraftColumnBridge.expression(col("embedding")), pivots, 0))
  }

  test("dirty data stays total: NaN floats and null elements never crash") {
    // all-NaN row: every dot folds to -Inf, smallest pivot ids win
    assert(topN(Seq(Float.NaN, Float.NaN), 2) == Seq(0, 1))
    // null element contributes zero: dots 1.0, 0.0, 0.6
    import spark.implicits._
    val df = Seq(Tuple1(Seq[java.lang.Float](1f, null))).toDF("embedding")
    val c = GraftColumnBridge.column(
      NearestPivots(GraftColumnBridge.expression(col("embedding").cast("array<float>")), pivots, 3))
    assert(df.select(c).head().getSeq[Int](0) == Seq(0, 2, 1))
  }

  test("analysis rejects non-float-array input") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("embedding") // array<double>
    val c = GraftColumnBridge.column(
      NearestPivots(GraftColumnBridge.expression(col("embedding")), pivots, 1))
    intercept[org.apache.spark.sql.AnalysisException](df.select(c).head())
  }

  test("interpreted eval agrees with the codegen path") {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1f, 1f))
    val e = NearestPivots(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 1f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      pivots, 3)
    val out = e.topN(arr)
    assert((0 until 3).map(out.getInt) == Seq(2, 0, 1))
  }
}
