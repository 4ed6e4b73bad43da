package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization per-row kernels for q105's corpus pass.
  *
  * WHY custom Expressions: the PQ encode (unit-normalize, then an
  * argmin-L2 over each subspace's codebook) and the ADC score (M
  * table lookups against a per-query LUT) are per-row primitive
  * loops over CONSTANT matrices — exactly [[NearestPivots]]'s shape.
  * A typed `mapPartitions` pass computes the same thing but forces
  * Deserialize/Serialize boundaries that break whole-stage codegen
  * around the corpus scan; as Expressions both kernels inline into
  * the scan's generated stage (PlanSpec pins the map-only shape).
  *
  * Bit-identity: the accumulation orders (norm fold, per-subspace
  * distance fold, LUT sum) match the driver-side reference encode in
  * `LlmVector` exactly — PqKernelsSpec pins codes and scores against
  * an independent reimplementation.
  *
  * Totality ([[NearestPivots]]'s conventions): null ARRAY → null
  * (nullSafeEval); null ELEMENTS read as 0; a short row zero-pads to
  * the codebook dimension. Ties in the argmin keep the lowest
  * codeword id (strict `<`), so encoding is deterministic.
  */
object PqKernels {
  /** codes(m) = argmin_j ‖unit(emb)[m·sub..(m+1)·sub) − books(m)(j)‖² */
  def encode(emb: Column, books: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(emb), books))

  /** Σ_m lut(m)(codes(m)) — the asymmetric distance of a coded vector
    * to the query the LUT was built from. */
  def adc(codes: Column, lut: Array[Array[Double]]): Column =
    column(AdcScore(expression(codes), lut))
}

case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val sub = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  def encode(in: ArrayData): ArrayData = {
    val dim = m * sub
    val v = new Array[Double](dim)
    val n = math.min(dim, in.numElements())
    var i = 0
    while (i < n) {
      v(i) = if (in.isNullAt(i)) 0d else in.getFloat(i).toDouble
      i += 1
    }
    var ss = 0d
    i = 0
    while (i < dim) { ss += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0) { i = 0; while (i < dim) { v(i) /= nrm; i += 1 } }
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val cents = books(mm)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        var d = 0d
        var k = 0
        while (k < sub) { val t = v(mm * sub + k) - cents(j)(k); d += t * t; k += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }

  protected override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode(($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class AdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  def score(in: ArrayData): Double = {
    val n = math.min(lut.length, in.numElements())
    var d = 0d
    var mm = 0
    while (mm < n) {
      if (!in.isNullAt(mm)) d += lut(mm)(in.getInt(mm))
      mm += 1
    }
    d
  }

  protected override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcScore", this, classOf[AdcScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score(($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcScore =
    copy(child = newChild)
}
