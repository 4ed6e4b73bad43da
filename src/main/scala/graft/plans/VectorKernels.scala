package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-row vector arithmetic for the embedding hot paths.
  *
  * WHY: the declarative dot product — `aggregate(zip_with(a, b, _*_),
  * 0d, _+_)` — is a higher-order-function lambda, which Spark
  * evaluates INTERPRETED (no whole-stage codegen; measured ~100× on
  * the text kernels). q43/q44 evaluate a dot per candidate row, so the
  * fold sat interpreted in the innermost loop of the ANN surface. The
  * kernel runs the same left-to-right accumulation as one compiled
  * loop — results are BIT-IDENTICAL to the HOF fold (same operation
  * order, same double widening; VectorKernelsSpec pins it), so oracle
  * hash-compares are unaffected.
  *
  * Totality: null ELEMENTS read as 0; ragged lengths dot over the
  * shorter prefix; null ARRAY → null (nullSafeEval). */
object VectorKernels {
  /** Deterministic left-fold dot product of two float arrays (double). */
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))

  /** Exact integer dot product of two bigint arrays (the milli-
    * quantized embedding grid of `LlmVector.QuantExpr`) — the compiled
    * form of `aggregate(zip_with(a, b, _*_), 0L, _+_)`, which as a
    * higher-order function evaluates INTERPRETED per row (the q166
    * lesson). The streaming embedding gate evaluates one of these per
    * (arrival × benchmark) pair, so the fold must not sit interpreted
    * in the innermost loop. Integer adds are order-exact, so kernel ≡
    * HOF unconditionally (VectorKernelsSpec pins it). */
  def dotq(a: Column, b: Column): Column = column(DotLong(expression(a), expression(b)))
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0d else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0d else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  protected override def nullSafeEval(v1: Any, v2: Any): Any =
    dot(v1.asInstanceOf[ArrayData], v2.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dot(($a), ($b));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Compiled exact bigint-array dot product (see [[VectorKernels.dotq]]).
  * Totality mirrors [[DotProduct]]: null elements read as 0, ragged
  * lengths dot over the shorter prefix, null array → null. Overflow
  * is the caller's contract — the milli-quantized grid keeps per-pair
  * dots ≲ 2^40 at dim ≤ 4096, far inside int64. */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dotq"

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0L else a.getLong(i)
      val y = if (b.isNullAt(i)) 0L else b.getLong(i)
      acc += x * y
      i += 1
    }
    acc
  }

  protected override def nullSafeEval(v1: Any, v2: Any): Any =
    dot(v1.asInstanceOf[ArrayData], v2.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotLong", this, classOf[DotLong].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dot(($a), ($b));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
