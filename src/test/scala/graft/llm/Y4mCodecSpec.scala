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
  * is the only detection). Round 16 (VERDICT r15 item 3): the fixture
  * mixes C444 and C420 — 4:2:0 is what `ffmpeg -f yuv4mpegpipe`
  * actually emits, so the demuxer must read half-res chroma planes,
  * accept the siting aliases, and quarantine the malformed odd-dim
  * case rather than inventing rounding. */
class Y4mCodecSpec extends AnyFunSuite {

  private def dims(id: Long) = ((8 + id % 9).toInt, (8 + id % 7).toInt)

  /** Luma sum: always the full grid. */
  private def ySum(id: Long, f: Int): Long = {
    val (w, h) = dims(id)
    (for (y <- 0 until h; x <- 0 until w) yield Y4mCodec.yAt(id, f, x, y).toLong).sum
  }

  /** Chroma sum: half-res grid for C420 docs, full grid for C444. */
  private def cSum(id: Long, f: Int, at: (Long, Int, Int, Int) => Int): Long = {
    val (w, h) = dims(id)
    val (cw, ch) = if (Y4mCodec.is420(id)) (w / 2, h / 2) else (w, h)
    (for (y <- 0 until ch; x <- 0 until cw) yield at(id, f, x, y).toLong).sum
  }

  private def checkExact(id: Long, fr: Y4mFrameQ): Unit = {
    val (w, h) = dims(id)
    assert(fr.width.contains(w) && fr.height.contains(h), s"id=$id dims")
    val f = fr.frame_idx.get
    assert(fr.y_sum.contains(ySum(id, f)), s"id=$id f=$f Y")
    assert(fr.u_sum.contains(cSum(id, f, Y4mCodec.uAt)), s"id=$id f=$f U")
    assert(fr.v_sum.contains(cSum(id, f, Y4mCodec.vAt)), s"id=$id f=$f V")
  }

  test("round trip: sampled frames' dims + plane sums equal the formula exactly") {
    // 12345 is a C420 doc (odd id, 14x12): the mix is exercised here
    for (id <- Seq(0L, 1L, 2L, 7L, 42L, 12345L)) {
      val n = Y4mCodec.nFrames(id)
      val out = Y4mCodec.decodeSampledSafe(id, n, Y4mCodec.encodeY4m(id))
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id sampling")
      out.foreach { fr => assert(fr.status == "ok", s"id=$id"); checkExact(id, fr) }
    }
  }

  test("C420 docs exist in the fixture mix and demux half-res chroma exactly") {
    val ids420 = Seq(9L, 27L, 63L, 12345L)
    ids420.foreach(id => assert(Y4mCodec.is420(id), s"id=$id should be C420"))
    assert(!Y4mCodec.is420(0L) && !Y4mCodec.is420(7L), "C444 arm must survive too")
    for (id <- ids420) {
      val (w, h) = dims(id)
      val bytes = Y4mCodec.encodeY4m(id)
      val header = new String(bytes.takeWhile(_ != 0x0A), "US-ASCII")
      assert(header.endsWith(" C420"), header)
      // stream size proves half-res chroma: header + nf * (6 + 1.5*w*h)
      val expectLen = header.length + 1 +
        Y4mCodec.nFrames(id) * (6 + w * h + 2 * (w / 2) * (h / 2))
      assert(bytes.length == expectLen, s"id=$id stream length")
      val out = Y4mCodec.decodeSampledSafe(id, Y4mCodec.nFrames(id), bytes)
      out.foreach { fr => assert(fr.status == "ok", s"id=$id"); checkExact(id, fr) }
    }
  }

  test("the ffmpeg-default siting aliases (C420jpeg/C420mpeg2/C420paldv) all demux") {
    // handcrafted 8x8 single-frame stream: Y plane = 1s, U = 2s, V = 3s
    for (alias <- Seq("420jpeg", "420mpeg2", "420paldv", "420")) {
      val planes = Array.fill[Byte](64)(1) ++ Array.fill[Byte](16)(2) ++ Array.fill[Byte](16)(3)
      val stream = s"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C$alias\nFRAME\n".getBytes("US-ASCII") ++ planes
      val out = Y4mCodec.decodeSampledSafe(20L, 1, stream)
      assert(out.map(_.status) == Seq("ok"), s"C$alias")
      assert(out.head.y_sum.contains(64L) && out.head.u_sum.contains(32L) &&
        out.head.v_sum.contains(48L), s"C$alias plane sums")
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
    for (id <- Seq(4L, 9L, 14L, 99L)) { // kind-4 ids; 9 is a C420 doc
      val nf = Y4mCodec.nFrames(id)
      val whole = Y4mCodec.encodeY4m(id)
      val out = Y4mCodec.decodeSampledSafe(id, nf, whole.take(whole.length - 10))
      val n = nf - 1
      val expectIdx = Seq(0, n / 2, n - 1).distinct
      assert(out.map(_.frame_idx.get) == expectIdx, s"id=$id")
      out.foreach { fr =>
        assert(fr.status == "short", s"id=$id — a dropped frame must not pass as ok")
        checkExact(id, fr)
      }
    }
  }

  test("a cut inside a FRAME marker line is still a silent short read, not a crash") {
    // cut so the last frame's marker itself is partial ("FRA") — the
    // census must stop at the last complete frame and raise nothing
    val id = 10L // C444 (even id)
    val nf = Y4mCodec.nFrames(id)
    val whole = Y4mCodec.encodeY4m(id)
    val (w, h) = dims(id)
    val lastFrame = 6 + 3 * w * h // FRAME\n + full-res planes
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
    // a genuinely unsupported colourspace (4:2:2) is a quarantine,
    // not a wrong answer
    val c422 = "YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C422\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](128)(1)
    assert(Y4mCodec.decodeSampledSafe(11L, 1, c422).map(_.status) == Seq("quarantined"))
    // odd-dim C420 is malformed per the format (chroma planes don't
    // tile): quarantine, never invent a rounding
    val odd420 = "YUV4MPEG2 W9 H8 F25:1 Ip A1:1 C420\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](108)(1)
    assert(Y4mCodec.decodeSampledSafe(13L, 1, odd420).map(_.status) == Seq("quarantined"))
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
