package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum-cost word segmentation under a unigram token vocabulary
  * (the Viterbi decode of a SentencePiece-style unigram LM, Kudo
  * 2018) — q228's per-word E-step, as a native codegen Expression.
  *
  * DP: dp(0) = 0; dp(i) = min over j ∈ [i − maxTok, i) with
  * w[j..i) ∈ vocab of dp(j) + cost(w[j..i)); ties keep the SMALLEST
  * j (equivalently the longest last token) — the total order the
  * DuckDB oracle replicates with list_min over the equal-cost
  * backpointers. Costs are integer micro-nats (round(1e6·ln(total/
  * count))) so the DP is pure integer arithmetic — deterministic and
  * engine-portable; the only float step (the ln) happens ONCE per
  * vocab entry upstream, not per word. The cost table rides the
  * closure serialized once per executor (vocab-bounded by
  * construction: the trainer caps it at UniMaxVocab + the char set),
  * rebuilt into a flat HashMap on first use per JVM.
  *
  * Totality: a word with any char outside the vocabulary has no
  * segmentation — returns the EMPTY array (callers treat it as
  * unsegmentable; unreachable from q228, whose vocabulary always
  * contains every char of every word). Null input → null.
  */
object UnigramViterbi {
  def segment(word: Column, costs: Map[String, Long], maxTok: Int): Column =
    column(UnigramViterbiSegment(expression(word), costs, maxTok))
}

case class UnigramViterbiSegment(child: Expression, costs: Map[String, Long], maxTok: Int)
    extends UnaryExpression {
  require(maxTok >= 1 && costs.nonEmpty,
    "unigram_viterbi_segment requires maxTok >= 1 and a non-empty cost table")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.size * 2)
    costs.foreach { case (t, c) => m.put(t, c) }
    m
  }

  def segment(s: UTF8String): GenericArrayData = {
    val w = s.toString
    val n = w.length
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Long.MaxValue)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxTok)
      while (j < i) {
        if (dp(j) != Long.MaxValue) {
          val c = table.get(w.substring(j, i))
          // strict < keeps the first (smallest) j at equal cost
          if (c != null && dp(j) + c < dp(i)) { dp(i) = dp(j) + c; bp(i) = j }
        }
        j += 1
      }
      i += 1
    }
    if (dp(n) == Long.MaxValue) return new GenericArrayData(Array.empty[Any])
    var k = n
    var toks = List.empty[UTF8String]
    while (k > 0) {
      toks = UTF8String.fromString(w.substring(bp(k), k)) :: toks
      k = bp(k)
    }
    new GenericArrayData(toks.toArray[Any])
  }

  protected override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uvs", this, classOf[UnigramViterbiSegment].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment(($c));")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiSegment =
    copy(child = newChild)
}
