package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal.{Y4mCodec, Y4mFrameQ}

/** The video analogue of WavCodecSpec/GifCodecSpec: pins the YUV4MPEG2
  * encode→demux round trip bit-exact against the generative formula,
  * the {first, middle, last} sampling contract, the offset-arithmetic
  * seek (no decode of unsampled frames), and each of the three status
  * modes q153's oracle grades end-to-end — including the silent
  * tail-truncation mode a raw stream cannot self-report (no frame
  * count or trailer in the container; the catalog's expected_frames
  * is the only detection). */
class Y4mCodecSpec extends AnyFunSuite {

  private def planeSum(id: Long, f: Int, at: (Long, Int, Int, Int) => Int): Long = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    (for (y <- 0 until h; x <- 0 until w) yield at(id, f, x, y).toLong).sum
  }

  test("round trip: sampled frames' dims + plane sums equal the formula exactly") {
    for (id <- Seq(0L, 1L, 2L, 7L, 42L, 12345L)) {
      val n = Y4mCodec.nFrames(id)
      val out = Y4mCodec.decodeSampledSafe(id, n, Y4mCodec.encodeY4m(id))
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id sampling")
      out.foreach { fr =>
        assert(fr.status == "ok", s"id=$id")
        assert(fr.width.contains((8 + id % 9).toInt))
        assert(fr.height.contains((8 + id % 7).toInt))
        val f = fr.frame_idx.get
        assert(fr.y_sum.contains(planeSum(id, f, Y4mCodec.yAt)), s"id=$id f=$f Y")
        assert(fr.u_sum.contains(planeSum(id, f, Y4mCodec.uAt)), s"id=$id f=$f U")
        assert(fr.v_sum.contains(planeSum(id, f, Y4mCodec.vAt)), s"id=$id f=$f V")
      }
    }
  }

  test("sampling is a subset: only first/middle/last decode, never every frame") {
    // nf=5 ids sample {0,2,4} — frames 1 and 3 are skipped by construction
    val id = 3L
    assert(Y4mCodec.nFrames(id) == 5)
    val out = Y4mCodec.decodeSampledSafe(id, 5, Y4mCodec.encodeY4m(id))
    assert(out.map(_.frame_idx.get) == Seq(0, 2, 4))
  }

  test("tail-cut: silent short read — nf-1 complete frames, status 'short', survivors exact") {
    for (id <- Seq(4L, 9L, 14L, 99L)) { // kind-4 ids
      val nf = Y4mCodec.nFrames(id)
      val whole = Y4mCodec.encodeY4m(id)
      val out = Y4mCodec.decodeSampledSafe(id, nf, whole.take(whole.length - 10))
      val n = nf - 1
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id")
      out.foreach { fr =>
        assert(fr.status == "short", s"id=$id — a dropped frame must not pass as ok")
        val f = fr.frame_idx.get
        assert(fr.y_sum.contains(planeSum(id, f, Y4mCodec.yAt)) &&
          fr.u_sum.contains(planeSum(id, f, Y4mCodec.uAt)) &&
          fr.v_sum.contains(planeSum(id, f, Y4mCodec.vAt)),
          s"id=$id f=$f: surviving frames must demux exactly")
      }
    }
  }

  test("a cut inside a FRAME marker line is still a silent short read, not a crash") {
    // cut so the last frame's marker itself is partial ("FRA") — the
    // census must stop at the last complete frame and raise nothing
    val id = 10L
    val nf = Y4mCodec.nFrames(id)
    val whole = Y4mCodec.encodeY4m(id)
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    val lastFrame = 6 + 3 * w * h // FRAME\n + planes
    val out = Y4mCodec.decodeSampledSafe(id, nf, whole.take(whole.length - lastFrame + 3))
    assert(out.forall(_.status == "short"))
    assert(out.map(_.frame_idx.get).max == nf - 2)
  }

  test("header-cut, magic-less, and hostile payloads quarantine, never throw") {
    val hc = Y4mCodec.decodeSampledSafe(3L, Y4mCodec.nFrames(3L), Y4mCodec.encodeY4m(3L).take(6))
    assert(hc == Seq(Y4mFrameQ(3L, "quarantined", None, None, None, None, None, None)))
    val garbage = Array.tabulate[Byte](64)(i => ((7L * 31 + i * 7) % 251).toByte)
    assert(Y4mCodec.decodeSampledSafe(7L, 3, garbage).map(_.status) == Seq("quarantined"))
    assert(Y4mCodec.decodeSampledSafe(9L, 2, Array.emptyByteArray).map(_.status) == Seq("quarantined"))
    // an unsupported colourspace is a quarantine, not a wrong answer
    val c420 = "YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII") ++
      Array.fill[Byte](200)(1)
    assert(Y4mCodec.decodeSampledSafe(11L, 1, c420).map(_.status) == Seq("quarantined"))
    // a decompression-bomb header (huge declared dims) quarantines
    // before any allocation
    val bomb = "YUV4MPEG2 W100000 H100000 F25:1 Ip A1:1 C444\nFRAME\n".getBytes("US-ASCII")
    assert(Y4mCodec.decodeSampledSafe(12L, 1, bomb).map(_.status) == Seq("quarantined"))
  }

  test("an exact expected count is not 'short'; a padded expectation is") {
    val id = 5L
    val bytes = Y4mCodec.encodeY4m(id)
    assert(Y4mCodec.decodeSampledSafe(id, Y4mCodec.nFrames(id), bytes).head.status == "ok")
    assert(Y4mCodec.decodeSampledSafe(id, Y4mCodec.nFrames(id) + 1, bytes).head.status == "short")
  }
}
