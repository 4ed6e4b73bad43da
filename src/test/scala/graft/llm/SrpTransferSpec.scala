package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q180's signature kernel: the sign matrix must match independently
  * computed md5 parities (not the Scala code's own output), and the
  * signature must behave like a hyperplane sketch — identical vectors
  * collide at hamming 0, antipodal vectors at hamming 16 (when no
  * plane-dot is exactly zero).
  */
class SrpTransferSpec extends SparkSpec {

  test("sign matrix matches independently computed md5 parities") {
    val s = LlmVector.srpSigns(16, 64)
    // values computed OUTSIDE this codebase (python hashlib):
    // md5('0:0')[:8] even -> +1; '1:3' -> +1; '7:21' -> +1; '15:63' -> -1
    assert(s(0)(0) == 1L)
    assert(s(1)(3) == 1L)
    assert(s(7)(21) == 1L)
    assert(s(15)(63) == -1L)
    assert(s.length == 16 && s.forall(_.length == 64))
    // parity is ~balanced — a systematic bias would make every
    // hyperplane lean the same way and collapse the sketch
    val pos = s.flatten.count(_ == 1L)
    assert(pos > 400 && pos < 624, s"sign balance off: $pos/1024 positive")
  }

  test("identical vectors share a signature; antipodal vectors flip every bit") {
    import spark.implicits._
    val v = (1 to 64).map(i => (math.sin(i * 1.7) * 0.9).toFloat)
    val e = Seq((1L, v), (2L, v), (3L, v.map(-_)))
      .toDF("vec_id", "embedding")
    val sig = LlmVector.srpSignatures(e, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L), "identical vectors must collide at hamming 0")
    val ham = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    // every plane-dot of this vector is nonzero (checked below), so
    // negation flips every bit
    val q = v.map(x => math.round(x * 1000f).toLong)
    val dots = LlmVector.srpSigns(16, 64).map(pl =>
      pl.zip(q).map { case (a, b) => a * b }.sum)
    assert(dots.forall(_ != 0L), s"degenerate plane-dot in the test vector: $dots")
    assert(ham == 16, s"antipodal hamming was $ham")
  }

  test("signature bits agree with a direct Scala fold") {
    import spark.implicits._
    val vs = Seq(
      (10L, (1 to 64).map(i => math.sin(i * 2.1).toFloat)),
      (11L, (1 to 64).map(i => math.cos(i * 0.7).toFloat * 0.3f)))
    val got = LlmVector.srpSignatures(vs.toDF("vec_id", "embedding"), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val signs = LlmVector.srpSigns(16, 64)
    vs.foreach { case (id, v) =>
      val q = v.map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val expected = (0 until 16).map { p =>
        val d = signs(p).zip(q).map { case (a, b) => a * b }.sum
        if (d > 0) 1L << p else 0L
      }.sum
      assert(got(id) == expected, s"vec $id")
    }
  }
}
