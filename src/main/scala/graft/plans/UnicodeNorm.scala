package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd scalar kernel (q88).
  *
  * Web-scraped text mixes precomposed and decomposed forms ("café" as
  * U+00E9 vs e+U+0301); every downstream exact/dedup/hash operator in
  * this engine treats bytes as identity, so ingest must canonicalize
  * or the same text fingerprints differently. NFC is the canonical
  * composition (what the q88 oracle checks via DuckDB's
  * `nfc_normalize`); NFKC additionally folds compatibility forms
  * (ligatures, fullwidth) and is spec-pinned (UnicodeNormSpec) since
  * DuckDB exposes no NFKC.
  *
  * The kernel stays inside whole-stage codegen (`nullSafeCodeGen` →
  * one static call per row) and takes the already-normalized fast
  * path: `Normalizer.isNormalized` is a cheap quick-check scan (most
  * real web text IS already NFC), returning the input UTF8String
  * unchanged — zero allocation. Only strings that actually need
  * recomposition pay the String round-trip. Normalization is
  * per-row, so the operator is map-only at any scale.
  */
object UnicodeNorm {

  /** NFC-normalize, re-using the input buffer when already normal. */
  def nfc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFC)

  /** NFKC (compatibility fold + compose). */
  def nfkc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFKC)

  private def norm(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(j, form))
  }

  def nfcCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeText(org.apache.spark.sql.GraftColumnBridge.expression(c), nfkc = false))

  def nfkcCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeText(org.apache.spark.sql.GraftColumnBridge.expression(c), nfkc = true))
}

case class NormalizeText(child: Expression, nfkc: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = if (nfkc) "nfkc_normalize" else "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (nfkc) UnicodeNorm.nfkc(s) else UnicodeNorm.nfc(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (nfkc) "nfkc" else "nfc"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.UnicodeNorm.$fn($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
