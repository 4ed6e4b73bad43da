package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.llm.Multimodal.MkvCodec

/** ScalaCheck properties of the EBML varint codec — the one encoding
  * in the media surface with CONTENT-DEPENDENT field widths, so a
  * single fixture can't cross every width boundary the way the
  * fixed-width RIFF/BMFF readers are crossed by construction.
  * (scalatestplus isn't on the offline classpath; properties run
  * through scalacheck's own Test runner — the MergeProps pattern.) */
class EbmlProps extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$label: $res")
  }

  // sizes that cross every 7-bit width boundary 1..8 plus randoms
  private val sizeGen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 200L),
    Gen.oneOf((1 to 7).flatMap(k =>
      Seq((1L << (7 * k)) - 2, (1L << (7 * k)) - 1, 1L << (7 * k)))),
    Gen.choose(0L, (1L << 56) - 2))

  test("vint(v) parses back to v at every width, and never reads as unknown-size") {
    check("roundtrip", Prop.forAll(sizeGen) { v =>
      val enc = MkvCodec.vint(v)
      val (got, len) = MkvCodec.rdSize(enc, 0, enc.length)
      got == v && len == enc.length
    })
  }

  test("vint survives arbitrary trailing garbage (length is self-delimiting)") {
    val garbage = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    check("self-delimiting", Prop.forAll(sizeGen, garbage) { (v, tail) =>
      val enc = MkvCodec.vint(v) ++ tail
      val (got, len) = MkvCodec.rdSize(enc, 0, enc.length)
      got == v && len == MkvCodec.vint(v).length
    })
  }

  test("a truncated vint is rejected, never mis-read") {
    check("truncation", Prop.forAll(sizeGen) { v =>
      val enc = MkvCodec.vint(v)
      enc.length == 1 || {
        val (_, len) = MkvCodec.rdSize(enc.dropRight(1), 0, enc.length - 1)
        len == 0 // unreadable, not a wrong value
      }
    })
  }

  test("encode->parse round trip at random frame counts and payload sizes") {
    // random payload BYTES (not JPEGs): parseMkv's slice arithmetic is
    // content-blind, so the walk must return exactly the payloads fed
    // in, at any block size crossing the 1/2/3-byte vint widths
    val payloadGen = Gen.listOfN(3,
      Gen.choose(1, 40000).flatMap(n => Gen.const(Array.tabulate(n)(i => (i * 31 + n).toByte))))
    check("walk-roundtrip", Prop.forAll(Gen.choose(0L, 1000L), payloadGen) { (id, ps) =>
      val bytes = MkvCodec.encodeMkv(id, ps)
      val got = MkvCodec.parseMkv(id, bytes)
      got.size == ps.size && got.zip(ps).forall { case ((off, len), p) =>
        len == p.length && java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bytes, off, off + len), p)
      }
    })
  }
}
