package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All id pairs with cosine ≥ `threshold` between two BLOCKS of
  * vectors — the inner kernel of blocked exact all-pairs similarity
  * (the 100 TB shape for mid-threshold embedding near-dup; see
  * `graft.llm.LlmVector.blockedPairs` for why LSH does NOT apply at
  * these thresholds).
  *
  * Inputs: two array<struct<id bigint, emb array<float>>> block
  * columns (from `collect_list(struct(...))`) and a boolean `same`
  * marking a block joined with itself. Output:
  * array<struct<vec_a bigint, vec_b bigint>> with vec_a < vec_b.
  * Enumeration: `same` blocks scan i < j once per unordered pair;
  * cross blocks scan all (i, j) and emit the pair id-ordered — with
  * disjoint block membership every unordered pair is produced exactly
  * once across the block-pair matrix.
  *
  * WHY a custom Expression: the relational formulation (posexplode →
  * position equi-join → sum) shuffles dim× the corpus and materializes
  * |pairs|·dim intermediate rows; this node keeps the whole dot-product
  * triangle in two primitive loops per block pair — compiled, cache-
  * friendly, and embarrassingly parallel across the B(B+1)/2 block
  * combinations (each task streams two blocks; B is picked so a block
  * pair fits in task memory).
  *
  * Numerics: floats are widened to double; dots/norms accumulate in
  * index order. The caller must place `threshold` far from any pair
  * (measured margin ≥ 1e-4 on all fixtures vs ~1e-15 summation
  * rounding), making the ≥ comparison engine-stable. Dirty data stays
  * total: null embedding ELEMENTS read as 0; a NaN cosine (corrupt
  * floats, zero norms) fails the ≥ test and drops the pair; ragged
  * lengths dot over the shorter prefix.
  */
case class PairCosine(first: Expression, second: Expression, third: Expression,
    threshold: Double) extends TernaryExpression {

  private def isBlock(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == LongType &&
        (f1.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isBlock(first.dataType) || !isBlock(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<bigint, array<float>>> blocks, got " +
          s"${first.dataType.catalogString} / ${second.dataType.catalogString}")
    else if (third.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a boolean same-block flag, got ${third.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("vec_a", LongType, nullable = false),
      StructField("vec_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "pair_cosine"

  /** (ids, unit-scaled doubles) of one block; zero-norm rows keep norm
    * 0 and divide to NaN later — dropped by the threshold test. */
  private def parse(block: ArrayData): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val arr = row.getArray(1)
      val m = arr.numElements()
      val v = new Array[Double](m)
      var j = 0
      var nn = 0d
      while (j < m) {
        val x = if (arr.isNullAt(j)) 0d else arr.getFloat(j).toDouble
        v(j) = x
        nn += x * x
        j += 1
      }
      embs(i) = v
      norms(i) = math.sqrt(nn)
      i += 1
    }
    (ids, embs, norms)
  }

  def pairs(a: ArrayData, b: ArrayData, same: Boolean): ArrayData = {
    val (idA, embA, nA) = parse(a)
    val (idB, embB, nB) = if (same) (idA, embA, nA) else parse(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < idA.length) {
      val va = embA(i)
      var j = if (same) i + 1 else 0
      while (j < idB.length) {
        if (idA(i) != idB(j)) {
          val vb = embB(j)
          val len = math.min(va.length, vb.length)
          var d = 0d
          var k = 0
          while (k < len) { d += va(k) * vb(k); k += 1 }
          if (d / (nA(i) * nB(j)) >= threshold) {
            val lo = math.min(idA(i), idB(j))
            val hi = math.max(idA(i), idB(j))
            out += new GenericInternalRow(Array[Any](lo, hi))
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
    val ref = ctx.addReferenceObj("pairCosine", this, classOf[PairCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b, s) => s"${ev.value} = $ref.pairs(($a), ($b), ($s));")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PairCosine =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PairCosine {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def pairs(blockA: Column, blockB: Column, same: Column, threshold: Double): Column =
    column(PairCosine(expression(blockA), expression(blockB), expression(same), threshold))
}
