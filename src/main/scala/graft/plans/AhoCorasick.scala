package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via an Aho–Corasick automaton
  * (Aho & Corasick 1975), as a native codegen Expression — the
  * blocklist/dirty-lexicon scan every curation pipeline runs over the
  * whole corpus.
  *
  * WHY a kernel: k independent `locate`/`regexp_count` passes cost
  * O(k·n) per row and k separate projections; the automaton walks each
  * document ONCE (O(n + matches)) regardless of pattern-set size, as a
  * map-only projection over the corpus scan — at 100 TB the blocklist
  * census has zero exchanges before its tiny (source × pattern)
  * aggregate. Patterns are compiled to a dense goto/fail table once
  * per JVM ([[MultiPatternCounts.auto]] is transient-lazy, rebuilt on
  * executors after deserialization, never shipped per row).
  *
  * Semantics: counts(i) = number of occurrences of patterns(i) in the
  * input, counting ALL matches — overlapping occurrences of a
  * self-overlapping pattern ("aa" in "aaa" = 2) and nested patterns
  * ("table" inside a "window table" match) each count; matching is
  * exact on char units (the caller lowercases; a non-ASCII char
  * resets the automaton to root, correct because patterns are
  * constrained ASCII < 128). Null input → null; empty patterns are
  * rejected at construction.
  */
object AhoCorasick {
  def counts(text: Column, patterns: Seq[String]): Column =
    column(MultiPatternCounts(expression(text), patterns))

  /** Dense-transition automaton: goto over the 128-char alphabet,
    * BFS fail links, per-state merged output pattern-id lists. */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(p =>
      p.nonEmpty && p.forall(_ < 128)),
      "patterns must be non-empty ASCII(<128) strings")
    private val delta: Array[Array[Int]] = {
      val nodes = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
      patterns.zipWithIndex.foreach { case (p, _) =>
        var u = 0
        p.foreach { ch =>
          if (nodes(u)(ch) == -1) {
            nodes += Array.fill(128)(-1)
            nodes(u)(ch) = nodes.length - 1
          }
          u = nodes(u)(ch)
        }
      }
      nodes.toArray
    }
    private val ends: Array[Array[Int]] = {
      val e = Array.fill(delta.length)(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, i) =>
        var u = 0
        p.foreach(ch => u = delta(u)(ch))
        e(u) = i :: e(u)
      }
      e.map(_.reverse.toArray)
    }
    /** Merged outputs after fail-closure + dense delta completion. */
    val out: Array[Array[Int]] = {
      val fail = new Array[Int](delta.length)
      val merged = ends.clone()
      val q = scala.collection.mutable.Queue[Int]()
      var c = 0
      while (c < 128) {
        val v = delta(0)(c)
        if (v == -1) delta(0)(c) = 0 else { fail(v) = 0; q += v }
        c += 1
      }
      while (q.nonEmpty) {
        val u = q.dequeue()
        if (merged(fail(u)).nonEmpty)
          merged(u) = merged(u) ++ merged(fail(u))
        var ch = 0
        while (ch < 128) {
          val v = delta(u)(ch)
          if (v == -1) delta(u)(ch) = delta(fail(u))(ch)
          else { fail(v) = delta(fail(u))(ch); q += v }
          ch += 1
        }
      }
      merged
    }
    val nPatterns: Int = patterns.length

    /** Per-pattern occurrence counts over `s` (all matches). */
    def count(s: UTF8String): GenericArrayData = {
      val str = s.toString
      val counts = new Array[Long](nPatterns)
      var state = 0
      var i = 0
      val n = str.length
      while (i < n) {
        val ch = str.charAt(i)
        state = if (ch < 128) delta(state)(ch) else 0
        val o = out(state)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }
}

/** string → array<long> of per-pattern all-occurrence counts. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_counts"

  @transient private lazy val auto = new AhoCorasick.Automaton(patterns)
  def count(s: UTF8String): Any = auto.count(s)

  protected override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mpc", this, classOf[MultiPatternCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.count(($c));")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}
