package graft.llm

import graft.SparkSpec

/** Gate for q199's Zipf doubling-rank curve: the sampled
  * (rank, frequency, ratio) rows must match an exact Scala brute force
  * on a hand corpus with an engineered rank profile (ties inside a
  * sampled rank, a template-spam source whose curve cliffs); the
  * fixture run must satisfy the sampling and monotonicity laws. */
class ZipfCurveSpec extends SparkSpec {

  private val q199 = graft.SparkEntry.all.find(_.name == "q199_zipf_curve").get

  private def brute(rows: Seq[(String, String)]): Seq[(String, Long, Long, Option[Long])] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val counts = ds.flatMap(_._2.toLowerCase.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }
      val sampled = counts.zipWithIndex
        .map { case ((_, c), i) => (i + 1L, c) }
        .filter { case (rk, _) => (rk & (rk - 1)) == 0 }
      sampled.zip(None +: sampled.map(p => Some(p._2))).map {
        case ((rk, c), prev) => (src, rk, c, prev.map(1000L * c / _))
      }
    }

  private def run(rows: Seq[(String, String)]): Seq[(String, Long, Long, Option[Long])] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q199.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    TextMining.release(spark)
    out
  }

  test("matches the brute force: ties at a sampled rank, cliff, case fold") {
    val rows = Seq(
      // zipfy: f = 8,4,4,2,1,1,1,1,1 → ranks 1,2,4,8 sampled; the tie at
      // f=4 puts rank 2 vs 3 on the word order ("b" before "c")
      ("zipfy", "a a a a A a a a b b b b c c"),
      ("zipfy", "c c d d e f g h i"),
      // spam: one word dominates → ratio cliffs at rank 2 (1000*1/9=111)
      ("spam", "ad ad ad ad ad ad ad ad ad buy now"))
    assert(run(rows) == brute(rows))
  }

  test("fixture: ranks are powers of two, freq non-increasing, ratio in (0,1000]") {
    val out = q199.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val bySrc = out.groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foreach(r => assert((r.getLong(1) & (r.getLong(1) - 1)) == 0))
      // rank column strictly doubles: 1, 2, 4, ... with no gaps
      sorted.map(_.getLong(1)).zipWithIndex.foreach { case (rk, i) =>
        assert(rk == (1L << i))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) <= a.getLong(2))
          assert(!b.isNullAt(3) && b.getLong(3) == 1000L * b.getLong(2) / a.getLong(2))
        case _ => ()
      }
      assert(sorted.head.isNullAt(3))
    }
    TextMining.release(spark)
  }
}
