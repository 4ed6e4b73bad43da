package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.llm.Multimodal.{AviCodec, Mp4Codec, MkvCodec}

/** Never-throw fuzz across all three container demuxers — the 100 TB
  * contract their scaladocs state ("a hostile payload must never kill
  * the stage") checked the adversarial way: random bytes, random
  * truncations of valid containers, and random single-byte mutations
  * of valid containers (the bit-rot case) must all come back as
  * COUNTED census rows with a legal taxonomy, for every demuxer, on
  * hundreds of generated cases. Complements the per-codec specs'
  * targeted hostile cases (clamps, size bombs) with breadth. */
class MediaFuzzProps extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$label: $res")
  }

  private val legal = Set("ok", "short", "bad_frame", "quarantined")

  private def decoders(id: Long): Seq[(String, Array[Byte] => Seq[Multimodal.AviFrameQ])] = Seq(
    "avi" -> ((b: Array[Byte]) => AviCodec.decodeFramesSafe(id, b)),
    "mp4" -> ((b: Array[Byte]) => Mp4Codec.decodeFramesSafe(id, b)),
    "mkv" -> ((b: Array[Byte]) => MkvCodec.decodeFramesSafe(id, 3, b)))

  private def valid(id: Long): Seq[(String, Array[Byte])] = {
    val aviN = AviCodec.nFrames(id)
    val mp4N = Mp4Codec.nFrames(id)
    val mkvN = MkvCodec.nFrames(id)
    Seq(
      "avi" -> AviCodec.encodeAvi(id, aviN, (0 until aviN).map(f => AviCodec.frameJpeg(id, f))),
      "mp4" -> Mp4Codec.encodeMp4(id, mp4N, (0 until mp4N).map(f => Mp4Codec.frameJpeg(id, f))),
      "mkv" -> MkvCodec.encodeMkv(id, (0 until mkvN).map(f => MkvCodec.frameJpeg(id, f))))
  }

  private def rowsAreLegal(rows: Seq[Multimodal.AviFrameQ]): Boolean =
    rows.nonEmpty && rows.forall(r => legal(r.status)) &&
      rows.forall(r => r.status != "quarantined" || r.frame_idx.isEmpty)

  test("random bytes: every demuxer returns counted rows, never throws") {
    val bytesGen = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    check("random-bytes", Prop.forAll(bytesGen, Gen.choose(0L, 99L)) { (bytes, id) =>
      decoders(id).forall { case (_, d) => rowsAreLegal(d(bytes)) }
    })
  }

  test("random truncations of valid containers stay legal") {
    check("truncations", Prop.forAll(Gen.choose(0L, 99L), Gen.choose(0.0, 1.0)) { (id, frac) =>
      valid(id).zip(decoders(id)).forall { case ((_, whole), (_, d)) =>
        rowsAreLegal(d(whole.take((whole.length * frac).toInt)))
      }
    })
  }

  test("random single-byte mutations of valid containers stay legal") {
    check("mutations", Prop.forAll(Gen.choose(0L, 99L), Gen.choose(0, Int.MaxValue),
        Gen.choose(-128, 127).map(_.toByte)) { (id, posSeed, b) =>
      valid(id).zip(decoders(id)).forall { case ((_, whole), (_, d)) =>
        val m = whole.clone()
        m(posSeed % m.length) = b
        rowsAreLegal(d(m))
      }
    })
  }
}
