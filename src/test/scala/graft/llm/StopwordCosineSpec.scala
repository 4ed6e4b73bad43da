package graft.llm

import graft.SparkSpec

/** Gate for q201's stopword-profile style matrix: every unordered
  * source pair must match an exact BigInt brute force replicating the
  * micro-share truncation; engineered cases pin the endpoints —
  * identical profiles at different scales read exactly 1e6 (the
  * scale-free claim), disjoint profiles read 0 but still appear in the
  * grid, zero-stopword sources drop out entirely. */
class StopwordCosineSpec extends SparkSpec {

  private val q201 = graft.SparkEntry.all.find(_.name == "q201_stopword_cosine").get

  private def brute(rows: Seq[(String, String)]): Seq[(String, String, Long, Long)] = {
    val sw = TextMining.Stopwords.toSet
    val prof: Map[String, Map[String, Long]] = rows.groupBy(_._1).view.mapValues { ds =>
      val cs = ds.flatMap(_._2.toLowerCase.split(" ").filter(w => w.nonEmpty && sw(w)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tot = cs.values.sum
      cs.view.mapValues(c => (BigInt(1000000) * c / tot).toLong).toMap
    }.toMap.filter(_._2.nonEmpty)
    (for {
      a <- prof.keys.toSeq; b <- prof.keys.toSeq if a < b
    } yield {
      val (pa, pb) = (prof(a), prof(b))
      val common = pa.keySet & pb.keySet
      val dot = common.toSeq.map(w => BigInt(pa(w)) * pb(w)).sum
      val n2a = pa.values.map(p => BigInt(p) * p).sum
      val n2b = pb.values.map(p => BigInt(p) * p).sum
      (a, b, common.size.toLong, (BigInt(1000000) * dot * dot / (n2a * n2b)).toLong)
    }).sortBy(p => (p._1, p._2))
  }

  private def run(rows: Seq[(String, String)]): Seq[(String, String, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("swcos").toString
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q201.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    graft.Caches.releaseAll(spark)
    out
  }

  test("endpoints: scale-free identity reads 1e6, disjoint reads 0, empty drops") {
    val rows = Seq(
      ("a1", "the the the of content words here"),
      ("b1", "the the the the the the of of more content"),  // same 3:1 ratio
      ("c1", "and and and"), ("d1", "with"),                 // disjoint pair
      ("e1", "zebra quark"))                                 // no stopwords
    val out = run(rows)
    assert(out == brute(rows))
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("a1", "b1")) == (2L, 1000000L))
    assert(m(("c1", "d1")) == (0L, 0L))
    assert(!out.exists(r => r._1 == "e1" || r._2 == "e1"))
    assert(out.length == 4 * 3 / 2) // full grid over the 4 surviving sources
  }

  test("matches the brute force on a mixed-profile corpus") {
    val rows = Seq(
      ("x", "the of and to in it was on"), ("x", "the the of by"),
      ("y", "to to to in in from from from the"),
      ("z", "is are be was were the a an"))
    assert(run(rows) == brute(rows))
  }

  test("fixture: full grid, cos2 within [0, 1e6], symmetric-free ordering") {
    val out = q201.run(spark, "/root/testdata/sf0.001").collect()
    val sources = out.map(_.getString(0)).toSet ++ out.map(_.getString(1)).toSet
    assert(out.length == sources.size * (sources.size - 1) / 2)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= TextMining.Stopwords.size)
    }
    graft.Caches.releaseAll(spark)
  }
}
