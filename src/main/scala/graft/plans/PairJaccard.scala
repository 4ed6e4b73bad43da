package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All id pairs with exact Jaccard ≥ num/den between two BLOCKS of
  * SORTED shingle sets — the brute-force-baseline sibling of
  * [[PairCosine]] (same block-pair enumeration contract: `same`
  * blocks scan i < j, cross blocks scan all (i, j) and emit
  * id-ordered).
  *
  * Inputs: two array<struct<id bigint, sh array<long>>> block columns
  * whose shingle arrays are SORTED ASCENDING (callers use
  * `sort_array`; intersection is a linear merge, not a hash probe).
  * Output: array<struct<doc_a bigint, doc_b bigint, inter int,
  * uni int>> for pairs with den·inter ≥ num·uni — integer-exact, no
  * float threshold.
  *
  * WHY: the previous brute-baseline plan (explode shingles →
  * self-join on shingle → distinct candidate pairs → array_intersect
  * verify) shuffles the exploded shingle stream and is worst-case
  * quadratic in docs-per-shingle ANYWAY (it is brute force by
  * intent); the blocked kernel computes the same n²/2 set
  * intersections as compiled merges with one collect_list shuffle and
  * zero intermediate blowup. The LSH path (q41) remains the at-scale
  * candidate generator — this is the baseline it is verified against.
  *
  * Dirty data stays total: null array ELEMENTS read as Long.MinValue
  * (sorted first, still merge-comparable); empty shingle sets produce
  * no pairs (0 ≥ num·uni only if uni = 0, excluded by the
  * id-inequality and uni > 0 guard). */
case class PairJaccard(first: Expression, second: Expression, third: Expression,
    num: Int, den: Int) extends TernaryExpression {

  require(num >= 0 && den > 0, s"bad threshold $num/$den")

  private def isBlock(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == LongType &&
        (f1.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isBlock(first.dataType) || !isBlock(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<bigint, array<bigint>>> blocks, got " +
          s"${first.dataType.catalogString} / ${second.dataType.catalogString}")
    else if (third.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a boolean same-block flag, got ${third.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false),
      StructField("inter", IntegerType, nullable = false),
      StructField("uni", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pair_jaccard"

  private def parse(block: ArrayData): (Array[Long], Array[Array[Long]]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val shs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val arr = row.getArray(1)
      val m = arr.numElements()
      val v = new Array[Long](m)
      var j = 0
      while (j < m) {
        v(j) = if (arr.isNullAt(j)) Long.MinValue else arr.getLong(j)
        j += 1
      }
      shs(i) = v
      i += 1
    }
    (ids, shs)
  }

  /** Linear merge-intersection count of two sorted arrays. */
  private def intersect(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  def pairs(a: ArrayData, b: ArrayData, same: Boolean): ArrayData = {
    val (idA, shA) = parse(a)
    val (idB, shB) = if (same) (idA, shA) else parse(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < idA.length) {
      var j = if (same) i + 1 else 0
      while (j < idB.length) {
        if (idA(i) != idB(j)) {
          val inter = intersect(shA(i), shB(j))
          val uni = shA(i).length + shB(j).length - inter
          if (uni > 0 && den.toLong * inter >= num.toLong * uni) {
            val (lo, hi) =
              if (idA(i) < idB(j)) (idA(i), idB(j)) else (idB(j), idA(i))
            out += new GenericInternalRow(Array[Any](lo, hi, inter, uni))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  protected override def nullSafeEval(v1: Any, v2: Any, v3: Any): Any =
    pairs(v1.asInstanceOf[ArrayData], v2.asInstanceOf[ArrayData],
      v3.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairJaccard", this, classOf[PairJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b, s) => s"${ev.value} = $ref.pairs(($a), ($b), ($s));")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PairJaccard =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PairJaccard {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Pairs with Jaccard ≥ num/den between two sorted-shingle blocks. */
  def pairs(blockA: Column, blockB: Column, same: Column, num: Int, den: Int): Column =
    column(PairJaccard(expression(blockA), expression(blockB), expression(same), num, den))
}
