package graft.llm

import graft.SparkSpec

/** Gate for q207's padded-batch waste census: every bucket row must
  * match an exact Scala brute force on a hand corpus engineered to hit
  * the bucket boundaries (exactly 16, 17, the 2048 cap, and past it),
  * plus a zero-token doc that must drop; the fixture run must satisfy
  * the slot-accounting identity pad + kept = n_docs·bucket (absent
  * truncation). */
class PaddingWasteSpec extends SparkSpec {

  private val q207 = graft.SparkEntry.all.find(_.name == "q207_padding_waste").get

  private def bucketOf(v: Long): Long =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L).find(v <= _).getOrElse(2048L)

  private def brute(lens: Seq[Long]): Seq[(Long, Long, Long, Long, Long, Long)] =
    lens.filter(_ > 0).groupBy(bucketOf).toSeq.sortBy(_._1).map { case (b, vs) =>
      val pad = vs.map(v => math.max(b - v, 0L)).sum
      val kept = vs.map(math.min(_, 2048L)).sum
      val trunc = vs.map(v => math.max(v - 2048L, 0L)).sum
      (b, vs.size.toLong, kept, pad, trunc,
        (BigInt(1000) * pad / (BigInt(vs.size) * b)).toLong)
    }

  private def run(lens: Seq[Long]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("padw").toString
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0L until n).map(j => s"t$j").mkString(" "), "en", "s", n)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q207.run(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    TextMining.release(spark)
    out
  }

  test("matches the brute force across boundaries, the cap, and past it") {
    val lens = Seq[Long](1, 15, 16, 17, 32, 33, 100, 1024, 1025, 2048, 2049, 3000, 0)
    val (got, want) = (run(lens), brute(lens))
    assert(got == want, s"got $got\nexpected $want")
    // boundary pins: 16 pads zero slots; 17 lands in bucket 32; 2049 truncates
    val m = got.map(r => r._1 -> r).toMap
    assert(m(2048L)._5 == (2049 - 2048) + (3000 - 2048))
    assert(m(16L)._4 == (16 - 1) + (16 - 15)) // 16 itself pads nothing
    assert(m(32L)._2 == 2)                    // 17 and 32 (33 -> bucket 64)
  }

  test("fixture: slot accounting holds per bucket") {
    val out = q207.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (b, n, kept, pad, trunc, milli) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(kept + pad == n * b || trunc > 0) // identity absent truncation
      assert(milli == 1000L * pad / (n * b))
      assert((b & (b - 1)) == 0 && b >= 16 && b <= 2048)
    }
    TextMining.release(spark)
  }
}
