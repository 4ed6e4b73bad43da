package graft.llm

import graft.SparkSpec
import Multimodal.Y4mCodec

/** Gate for q212's scene-delta decode: the SADs must match a formula
  * brute force for whole clips (C444 and C420 ids), a tail-cut clip
  * must lose exactly its last pair and flag 'short' (a 2-frame clip
  * becomes pairless but stays visible), and a header-cut clip must
  * quarantine; the fixture run must satisfy the per-pixel identity. */
class SceneDeltaSpec extends SparkSpec {

  private def bruteSad(id: Long, f: Int): Long = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    (for (y <- 0 until h; x <- 0 until w) yield
      math.abs(Y4mCodec.yAt(id, f + 1, x, y) - Y4mCodec.yAt(id, f, x, y)).toLong).sum
  }

  test("whole clips: every consecutive pair matches the formula (444 and 420)") {
    for (id <- 0L to 12L) {
      val n = Y4mCodec.nFrames(id)
      val out = Y4mCodec.decodeDeltasSafe(id, n, Y4mCodec.encodeY4m(id))
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      assert(out.forall(_.status == "ok"))
      assert(out.map(_.frame_idx.get) == (0 until n - 1))
      out.foreach { r =>
        val want = bruteSad(id, r.frame_idx.get)
        assert(r.y_sad.contains(want), s"id $id f ${r.frame_idx}")
        assert(r.sad_px_milli.contains(1000L * want / (w * h)))
      }
    }
  }

  test("tail-cut loses exactly the last pair; 2-frame clips go pairless-short") {
    val id3 = 7L // nFrames(7) = 2 + 7%4 = 5
    val cut = Y4mCodec.encodeY4m(id3).dropRight(10)
    val out = Y4mCodec.decodeDeltasSafe(id3, Y4mCodec.nFrames(id3), cut)
    assert(out.forall(_.status == "short"))
    assert(out.map(_.frame_idx.get) == (0 until Y4mCodec.nFrames(id3) - 2))
    val id2 = 4L // nFrames(4) = 2: tail-cut leaves 1 frame -> no pairs
    val cut2 = Y4mCodec.encodeY4m(id2).dropRight(10)
    val out2 = Y4mCodec.decodeDeltasSafe(id2, 2, cut2)
    assert(out2 == Seq(Multimodal.Y4mDeltaQ(id2, "short", None, None, None)))
  }

  test("header-cut quarantines") {
    val out = Y4mCodec.decodeDeltasSafe(3L, 2, Y4mCodec.encodeY4m(3L).take(6))
    assert(out == Seq(Multimodal.Y4mDeltaQ(3L, "quarantined", None, None, None)))
  }

  test("fixture end to end: statuses partition the catalog; identities hold") {
    val q212 = graft.SparkEntry.all.find(_.name == "q212_video_scene_deltas").get
    val out = q212.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).distinct
    // every catalog doc appears exactly once in exactly one status class
    assert(out.map(r => (r.getLong(0), r.getString(1))).distinct.length == ids.length)
    out.filter(!_.isNullAt(2)).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      assert(r.getLong(3) == bruteSad(id, r.getInt(2)))
      assert(r.getLong(4) == 1000L * r.getLong(3) / (w * h))
    }
  }
}
