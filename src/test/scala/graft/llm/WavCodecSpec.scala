package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal.WavCodec

/** The audio analogue of MediaQuarantineSpec: pins the encode→decode
  * round trip bit-exact against the generative formula, and each of
  * the three status modes q134's oracle grades end-to-end. */
class WavCodecSpec extends AnyFunSuite {

  private def wavOf(id: Long, rate: Float): Array[Byte] = {
    val n = WavCodec.nSamples(id)
    WavCodec.encodeWav(Array.tabulate(n)(i => WavCodec.sampleAt(id, i).toShort), rate)
  }

  test("round trip: decoded stats equal the formula exactly, both rates") {
    for (id <- Seq(0L, 1L, 7L, 42L, 12345L); rate <- Seq(8000f, 16000f)) {
      val n = WavCodec.nSamples(id)
      val vals = (0 until n).map(WavCodec.sampleAt(id, _))
      val st = WavCodec.decodeSafe(id, wavOf(id, rate))
      assert(st.status == "ok", s"id=$id rate=$rate")
      assert(st.sample_rate.contains(rate.toInt))
      assert(st.n_samples.contains(n.toLong))
      assert(st.amp_sum.contains(vals.map(_.toLong).sum))
      assert(st.amp_max.contains(vals.max))
    }
  }

  test("data-truncated: header parses, status 'truncated', prefix stats exact") {
    for (id <- Seq(2L, 6L, 10L, 98L)) { // kind-2 ids
      val n = WavCodec.nSamples(id)
      val whole = wavOf(id, 8000f)
      val headerLen = whole.length - 2 * n
      assert(headerLen > 0, "encoder wrote no header?")
      val cut = whole.take(headerLen + n) // n data bytes -> n/2 whole samples
      val st = WavCodec.decodeSafe(id, cut)
      val m = n / 2
      val vals = (0 until m).map(WavCodec.sampleAt(id, _))
      assert(st.status == "truncated", s"id=$id")
      assert(st.n_samples.contains(m.toLong))
      assert(st.amp_sum.contains(vals.map(_.toLong).sum))
      assert(st.amp_max.contains(vals.max))
    }
  }

  test("header-cut and magic-less payloads quarantine, never throw") {
    val ht = WavCodec.decodeSafe(3L, wavOf(3L, 8000f).take(16))
    assert(ht == Multimodal.WavStatQ(3L, "quarantined", None, None, None, None))
    val garbage = Array.tabulate[Byte](64)(i => ((7L * 31 + i * 7) % 251).toByte)
    val g = WavCodec.decodeSafe(7L, garbage)
    assert(g.status == "quarantined" && g.n_samples.isEmpty)
    val empty = WavCodec.decodeSafe(9L, Array.emptyByteArray)
    assert(empty.status == "quarantined")
  }
}
