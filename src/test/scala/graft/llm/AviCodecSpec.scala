package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal.AviCodec

/** The container-walk analogue of GifCodecSpec/SceneDeltaSpec: pins
  * the MJPEG-in-AVI encode→demux→decode round trip (decoder-reported
  * dims — JPEG is lossy, so dims + taxonomy are the contract, q129's
  * discipline), every status mode q214's oracle grades end-to-end,
  * and the hostile-input guards the RIFF walk must hold at 100 TB:
  * untrusted chunk sizes clamp to the physical buffer before any
  * slice, truncated LISTs salvage their complete subchunks, non-frame
  * chunk ids are skipped by the walk, and no payload ever throws. */
class AviCodecSpec extends AnyFunSuite {

  private def encode(id: Long): Array[Byte] = {
    val nf = AviCodec.nFrames(id)
    AviCodec.encodeAvi(id, nf, (0 until nf).map(f => AviCodec.frameJpeg(id, f)))
  }

  test("round trip: every frame decodes 'ok' with formula dims") {
    for (id <- Seq(0L, 1L, 5L, 6L, 41L, 12345L)) { // kinds 0/1 and others
      val nf = AviCodec.nFrames(id)
      val out = AviCodec.decodeFramesSafe(id, encode(id))
      assert(out.size == nf, s"id=$id")
      assert(out.map(_.frame_idx.get) == (0 until nf), s"id=$id ordering")
      out.foreach { fr =>
        assert(fr.status == "ok", s"id=$id f=${fr.frame_idx}")
        assert(fr.width.contains((8 + id % 9).toInt), s"id=$id")
        assert(fr.height.contains((8 + id % 7).toInt), s"id=$id")
        assert(fr.n_px.contains((8 + id % 9) * (8 + id % 7)), s"id=$id")
      }
    }
  }

  test("tail-cut: the truncated movi LIST salvages nf-1 frames as 'short'") {
    for (id <- Seq(4L, 9L, 14L, 99L)) { // kind-4 ids
      val nf = AviCodec.nFrames(id)
      val whole = encode(id)
      val out = AviCodec.decodeFramesSafe(id, whole.take(whole.length - 10))
      assert(out.size == nf - 1, s"id=$id")
      out.foreach { fr =>
        assert(fr.status == "short", s"id=$id — a dropped frame must not pass as ok")
        assert(fr.width.contains((8 + id % 9).toInt),
          s"id=$id f=${fr.frame_idx}: surviving frames must still decode exactly")
      }
    }
  }

  test("corrupt frame payload: per-FRAME quarantine, container stays usable") {
    for (id <- Seq(2L, 7L, 12L)) { // kind-2 ids
      val nf = AviCodec.nFrames(id)
      val jpegs = (0 until nf).map(f => AviCodec.frameJpeg(id, f))
      val bytes = AviCodec.encodeAvi(id, nf, jpegs.updated(1, jpegs(1).take(8)))
      val out = AviCodec.decodeFramesSafe(id, bytes)
      assert(out.size == nf, s"id=$id: the chunk is present, so the row must be")
      assert(out(1).status == "bad_frame" && out(1).width.isEmpty, s"id=$id")
      out.zipWithIndex.filter(_._2 != 1).foreach { case (fr, f) =>
        assert(fr.status == "ok" && fr.width.contains((8 + id % 9).toInt),
          s"id=$id f=$f: one bad frame must not poison its neighbors")
      }
    }
  }

  test("header-cut, magic-less, and empty payloads quarantine, never throw") {
    for (bytes <- Seq(encode(3L).take(6), Array.fill[Byte](64)(0x41),
        Array.emptyByteArray, encode(8L).take(11))) {
      val out = AviCodec.decodeFramesSafe(3L, bytes)
      assert(out.map(_.status) == Seq("quarantined"))
      assert(out.head.frame_idx.isEmpty && out.head.width.isEmpty)
    }
  }

  private def patch(bytes: Array[Byte], find: String, repl: String): Array[Byte] = {
    val f = find.getBytes("US-ASCII"); val r = repl.getBytes("US-ASCII")
    val out = bytes.clone()
    val i = out.indices.indexWhere(j =>
      j + f.length <= out.length && f.indices.forall(k => out(j + k) == f(k)))
    assert(i >= 0, s"pattern $find not found")
    r.indices.foreach(k => out(i + k) = r(k))
    out
  }

  test("non-frame chunk ids are walked over, not decoded") {
    // relabel frame 0's chunk as an audio chunk '01wb': the walk must
    // skip its body via the size field and still find the later frames
    val id = 1L
    val nf = AviCodec.nFrames(id)
    val out = AviCodec.decodeFramesSafe(id, patch(encode(id), "00dc", "01wb"))
    assert(out.size == nf - 1, "the relabeled chunk must not be counted")
    // one frame short of the declared count -> the container reports it
    assert(out.forall(_.status == "short"))
    assert(out.forall(_.width.contains((8 + id % 9).toInt)))
  }

  test("hostile chunk size: a huge LE32 never drives an allocation or a throw") {
    val id = 6L
    val whole = encode(id)
    // find the first movi frame chunk and blow its size field to 0xFFFFFFFF
    val f = "00dc".getBytes("US-ASCII")
    val i = whole.indices.indexWhere(j =>
      j + 4 <= whole.length && f.indices.forall(k => whole(j + k) == f(k)))
    assert(i >= 0)
    val evil = whole.clone()
    (4 until 8).foreach(k => evil(i + k) = 0xFF.toByte)
    val out = AviCodec.decodeFramesSafe(id, evil)
    // the over-declared chunk reads as a truncated tail: the walk
    // stops counting there with no 4 GiB slice ever attempted; since
    // it was the FIRST frame chunk, no complete frame survives and
    // the doc quarantines as frameless — as a counted row, not a crash
    assert(out.map(_.status) == Seq("quarantined"))
  }

  test("over-declared RIFF size clamps to the physical buffer") {
    val id = 0L
    val whole = encode(id)
    val evil = whole.clone()
    (4 until 8).foreach(k => evil(k) = 0x7F.toByte) // ~2 GiB declared
    val out = AviCodec.decodeFramesSafe(id, evil)
    assert(out.size == AviCodec.nFrames(id))
    assert(out.forall(_.status == "ok"))
  }
}
