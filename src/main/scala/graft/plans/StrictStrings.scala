package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import com.ibm.icu.lang.{UCharacter, UProperty}

/** Python-faithful string casing for the strict-parity mode
  * (SURVEY §7.4.3): the reference casefolds every non-title capture
  * (`str.casefold`, scan.py:325) and title-cases sponsor tuples
  * (`str.title`, scan.py:248). Spark's `lower`/`initcap` differ on
  * real inputs — `casefold` folds ß→ss where `lower` keeps ß, and
  * `str.title` uppercases after ANY un-cased character ("o'brien" →
  * "O'Brien", "abc1d" → "Abc1D") where `initcap` only splits on
  * whitespace ("O'brien"). The engine default keeps the Spark
  * built-ins (codegen'd, divergence pinned in RegistryGoldenSpec);
  * `strictParity = true` swaps these in so output hash-matches an
  * oracle built on actual reference behavior.
  *
  * Both use ICU (already on Spark's classpath for collations), which
  * implements the same Unicode CaseFolding/SpecialCasing tables
  * CPython reads. [[pyTitle]] mirrors CPython's algorithm exactly:
  * titlecase a character following a non-cased character, lowercase
  * one following a cased character, "cased" per the Unicode Cased
  * property of the ORIGINAL character (simple per-codepoint mappings;
  * the full-mapping edge cases — e.g. title("ß") → "Ss" — cannot
  * reach this path because sponsor fields are casefolded first).
  *
  * Interpreted evaluation (CodegenFallback) is fine: strict mode is a
  * parity/debug path, not the shipped hot path.
  */
object StrictStrings {

  /** Unicode full case folding — Python `str.casefold`. */
  def casefold(s: String): String =
    UCharacter.foldCase(s, UCharacter.FOLD_CASE_DEFAULT)

  /** CPython `str.title`. */
  def pyTitle(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(
        if (prevCased) UCharacter.toLowerCase(cp) else UCharacter.toTitleCase(cp))
      prevCased = UCharacter.hasBinaryProperty(cp, UProperty.CASED)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def casefoldCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CaseFold(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def pyTitleCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PyTitle(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

case class CaseFold(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "py_casefold"
  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(StrictStrings.casefold(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): CaseFold =
    copy(child = newChild)
}

case class PyTitle(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "py_title"
  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(StrictStrings.pyTitle(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): PyTitle =
    copy(child = newChild)
}
