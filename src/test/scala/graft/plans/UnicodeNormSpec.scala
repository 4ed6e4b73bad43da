package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UnicodeNorm kernel: NFC/NFKC semantics + the zero-copy fast path.
  * NFKC has no DuckDB counterpart, so its behavior is pinned here
  * rather than by the q88 oracle. Inputs are UTF-8 DECOMPOSED byte
  * sequences, expectations composed — the combining-mark cases really
  * exercise recomposition (verify with `cat -A`: input cafe+0xCC81,
  * expected caf+0xC3A9). */
class UnicodeNormSpec extends SparkSpec {

  import org.apache.spark.unsafe.types.UTF8String

  test("NFC composes combining marks; NFKC additionally folds compatibility forms") {
    import spark.implicits._
    val cases = Seq(
      // (input, expected NFC, expected NFKC)
      ("café", "café", "café"), // e + combining acute
      ("å", "å", "å"),          // a + combining ring
      ("ﬁle", "ﬁle", "file"),         // fi ligature: NFKC folds
      ("Ｈi", "Ｈi", "Hi"),             // fullwidth H: NFKC folds
      ("plain ascii", "plain ascii", "plain ascii"))
    val out = cases.map(_._1).toDF("s")
      .select(UnicodeNorm.nfcCol(col("s")).as("nfc"),
        UnicodeNorm.nfkcCol(col("s")).as("nfkc"))
      .collect()
    cases.zip(out).foreach { case ((in, nfc, nfkc), row) =>
      assert(row.getString(0) == nfc, s"NFC(${in.codePoints().toArray.toSeq})")
      assert(row.getString(1) == nfkc, s"NFKC(${in.codePoints().toArray.toSeq})")
    }
  }

  test("already-normalized input returns the SAME buffer (no allocation)") {
    val s = UTF8String.fromString("already normal")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.nfkc(s) eq s)
  }

  test("null propagates through the kernel") {
    import spark.implicits._
    val out = Seq(Some("café"), None).toDF("s")
      .select(UnicodeNorm.nfcCol(col("s"))).collect()
    assert(out.exists(_.isNullAt(0)))
    assert(out.exists(r => !r.isNullAt(0) && r.getString(0) == "café"))
  }
}
