package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`n` nearest pivot ids for an embedding, by dot product against a
  * CONSTANT pivot matrix — the IVF bucket-assignment kernel as a custom
  * Catalyst [[Expression]] (the brief's extension point (b)).
  *
  * WHY a custom Expression: the declarative formulations both fail at
  * this shape. `crossJoin(pivots)` + `row_number` shuffles nlist× the
  * corpus to pick each row's argmax (the round-4 verdict's scale
  * killer); a fully unrolled `element_at`×literal sum (nlist × dim =
  * 1024 terms) blows past janino's method limits and silently drops
  * the whole stage to interpreted evaluation. This node embeds the
  * pivot matrix as a codegen reference object and runs two primitive
  * loops per row — a pure map-side projection, so the plan between the
  * corpus scan and the bucket column has ZERO exchanges (PlanSpec pins
  * this), and whole-stage codegen of the surrounding stage is
  * preserved (the generated code is one method call).
  *
  * Ties break to the smaller pivot id (strict `>` in the selection
  * scan), matching `ORDER BY dot DESC, pivot_id`. Pivots are expected
  * unit-norm, so argmax(dot) == argmax(cosine) per row.
  */
case class NearestPivots(child: Expression, pivots: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= pivots.length, s"n=$n out of range for ${pivots.length} pivots")

  // analysis-time type pin: getFloat on anything but array<float> would
  // silently reinterpret bytes
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_pivots"

  /** Dots then a top-n selection scan; `in` is the row's float array.
    * Dirty data stays total: null elements contribute 0, a NaN dot
    * (corrupt floats) sorts below every finite dot — never a crash,
    * and on an all-NaN row the n smallest pivot ids come out. */
  def topN(in: ArrayData): ArrayData = {
    val dots = new Array[Double](pivots.length)
    var j = 0
    while (j < pivots.length) {
      val p = pivots(j)
      val len = math.min(p.length, in.numElements())
      var d = 0d
      var i = 0
      while (i < len) {
        if (!in.isNullAt(i)) d += in.getFloat(i) * p(i)
        i += 1
      }
      dots(j) = if (java.lang.Double.isNaN(d)) Double.NegativeInfinity else d
      j += 1
    }
    val out = new Array[Int](n)
    val taken = new Array[Boolean](pivots.length)
    var r = 0
    while (r < n) {
      var best = -1
      var bd = Double.NegativeInfinity
      var k = 0
      while (k < dots.length) {
        if (!taken(k) && (best == -1 || dots(k) > bd)) { bd = dots(k); best = k }
        k += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  protected override def nullSafeEval(input: Any): Any =
    topN(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestPivots", this, classOf[NearestPivots].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.topN(($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestPivots =
    copy(child = newChild)
}
