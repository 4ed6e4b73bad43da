package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q110's overflow guard: the lift numerator 1000·n_ab·N outgrows
  * int64 at 100 TB (N ~ 1e10 with n_ab up to N), so the query runs it
  * in decimal(38,0) UNCONDITIONALLY. Two properties make that safe to
  * ship as the only path:
  *  - on in-range values the decimal floor-div equals the int64
  *    floor-div bit for bit (same quotient, long output type);
  *  - on values where int64 WRAPS, the decimal path keeps the true
  *    quotient (the wrap check is the reason the guard exists). */
class PmiLiftSpec extends SparkSpec {

  private def lift(expr0: String) = {
    import spark.implicits._
    Seq((7L, 3L, 1000000L, 11L, 13L)).toDF("k", "n_ab", "nt", "n_w1", "n_w2")
      .select(expr(expr0).cast("long").as("v")).first().getLong(0)
  }

  test("decimal lift == int64 lift on in-range fixtures") {
    // exhaustive-ish small sweep + the sf0.001 regime's magnitudes
    val cases = Seq((5L, 3128L, 7L, 9L), (1L, 1L, 1L, 1L),
      (999L, 123456789L, 1000L, 7L), (64L, 987654321L, 31L, 17L))
    for ((nab, nt, a, b) <- cases) {
      val dec = lift(s"(cast(1000 as decimal(38,0)) * ${nab}L * ${nt}L) div (${a}L * ${b}L)")
      val i64 = lift(s"(1000 * ${nab}L * ${nt}L) div (${a}L * ${b}L)")
      assert(dec == i64, s"decimal/int64 floors diverge on ($nab,$nt,$a,$b)")
    }
  }

  test("decimal lift survives where int64 overflows") {
    // n_ab·nt products past 2^63: int64 wraps (non-ANSI) or throws
    // (ANSI) — either way the true quotient is gone; decimal keeps it
    val nab = 4000000000L; val nt = 9000000000L
    val dec = lift(s"(cast(1000 as decimal(38,0)) * ${nab}L * ${nt}L) div (${nab}L)")
    assert(dec == 1000L * nt, s"decimal path lost the true quotient: $dec")
    val i64ok =
      try lift(s"(1000 * ${nab}L * ${nt}L) div (${nab}L)") == 1000L * nt
      catch { case _: Exception => false }
    assert(!i64ok, "int64 no longer overflows here — guard premise changed")
  }

  test("decimal denominator == int64 denominator in-range, survives hot-word wrap") {
    // r11: the denominator n_w1·n_w2 takes the same decimal cast — two
    // hot words at n_w ~ N push the raw int64 product past 2^63
    for ((a, b) <- Seq((11L, 13L), (1L, 1L), (3037000499L, 3L), (123456789L, 987654321L))) {
      val dec = lift(s"(cast(1000 as decimal(38,0)) * 7L * 1000L) div (cast(${a}L as decimal(38,0)) * ${b}L)")
      val i64 = lift(s"(1000 * 7L * 1000L) div (${a}L * ${b}L)")
      assert(dec == i64, s"decimal/int64 denominator floors diverge on ($a,$b)")
    }
    // n_w1·n_w2 past 2^63: numerator chosen so the true quotient is exact
    val hot = 4000000000L // hot^2 = 1.6e19 > 2^63
    val dec = lift(
      s"(cast(1000 as decimal(38,0)) * ${hot}L * ${hot}L) div (cast(${hot}L as decimal(38,0)) * ${hot}L)")
    assert(dec == 1000L, s"decimal denominator lost the true quotient: $dec")
  }

  test("the registered q110 plans the decimal numerator") {
    val df = graft.SparkEntry.queries("q110_pmi_bigrams")(spark, "/root/testdata/sf0.001")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("decimal(38,0)"),
      s"q110 lift no longer runs in decimal(38,0):\n$analyzed")
    assert(df.schema("lift_milli").dataType ==
      org.apache.spark.sql.types.LongType, "lift_milli must stay BIGINT")
    TextMining.release(spark)
  }
}
