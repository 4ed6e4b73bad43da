package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal.{GifCodec, GifFrameQ}

/** The multi-frame analogue of WavCodecSpec: pins the animated-GIF
  * encode→decode round trip bit-exact against the generative formula,
  * the {first, middle, last} sampling contract, and each of the three
  * status modes q145's oracle grades end-to-end — including the silent
  * tail-truncation mode GIF cannot self-report (no declared frame
  * count in the container; the catalog's expected_frames is the only
  * detection). */
class GifCodecSpec extends AnyFunSuite {

  private def frameSum(id: Long, f: Int): Long = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    (for (y <- 0 until h; x <- 0 until w) yield GifCodec.grayAt(id, f, x, y).toLong).sum
  }

  test("round trip: sampled frames' dims + pixel sums equal the formula exactly") {
    for (id <- Seq(0L, 1L, 2L, 7L, 42L, 12345L)) {
      val n = GifCodec.nFrames(id)
      val out = GifCodec.decodeSampledSafe(id, n, GifCodec.encodeGif(id))
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id sampling")
      out.foreach { fr =>
        assert(fr.status == "ok", s"id=$id")
        assert(fr.width.contains((8 + id % 9).toInt))
        assert(fr.height.contains((8 + id % 7).toInt))
        assert(fr.px_sum.contains(frameSum(id, fr.frame_idx.get)), s"id=$id f=${fr.frame_idx}")
      }
    }
  }

  test("sampling is a subset: only first/middle/last decode, never every frame") {
    // nf=4 ids sample {0,2,3} — frame 1 is skipped by construction
    val id = 2L
    assert(GifCodec.nFrames(id) == 4)
    val out = GifCodec.decodeSampledSafe(id, 4, GifCodec.encodeGif(id))
    assert(out.map(_.frame_idx.get) == Seq(0, 2, 3))
  }

  test("tail-cut: silent short read — nf-1 frames, status 'short', decoded frames exact") {
    for (id <- Seq(4L, 9L, 14L, 99L)) { // kind-4 ids
      val nf = GifCodec.nFrames(id)
      val whole = GifCodec.encodeGif(id)
      val out = GifCodec.decodeSampledSafe(id, nf, whole.take(whole.length - 10))
      val n = nf - 1
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id")
      out.foreach { fr =>
        assert(fr.status == "short", s"id=$id — a dropped frame must not pass as ok")
        assert(fr.px_sum.contains(frameSum(id, fr.frame_idx.get)),
          s"id=$id f=${fr.frame_idx}: surviving frames must decode exactly")
      }
    }
  }

  test("header-cut, magic-less, and empty payloads quarantine, never throw") {
    val hc = GifCodec.decodeSampledSafe(3L, GifCodec.nFrames(3L), GifCodec.encodeGif(3L).take(16))
    assert(hc == Seq(GifFrameQ(3L, "quarantined", None, None, None, None)))
    val garbage = Array.tabulate[Byte](64)(i => ((7L * 31 + i * 7) % 251).toByte)
    assert(GifCodec.decodeSampledSafe(7L, 3, garbage).map(_.status) == Seq("quarantined"))
    assert(GifCodec.decodeSampledSafe(9L, 2, Array.emptyByteArray).map(_.status) == Seq("quarantined"))
  }

  test("an exact expected count is not 'short'; a padded expectation is") {
    val id = 5L
    val bytes = GifCodec.encodeGif(id)
    assert(GifCodec.decodeSampledSafe(id, GifCodec.nFrames(id), bytes).head.status == "ok")
    assert(GifCodec.decodeSampledSafe(id, GifCodec.nFrames(id) + 1, bytes).head.status == "short")
  }
}
