package graft.llm

import graft.SparkSpec

/** Gate for q200's head-word burstiness census: every (word, df, n_w,
  * mean, fano) row must match an exact BigInt brute force on a hand
  * corpus with an engineered dispersion contrast (a clumped spam word,
  * an evenly-spread function word, a word below the head cutoff); the
  * fixture run must satisfy the moment identities. */
class BurstinessSpec extends SparkSpec {

  private val q200 = graft.SparkEntry.all.find(_.name == "q200_burstiness").get

  private def brute(rows: Seq[String]): Seq[(String, Long, Long, Long, Long)] = {
    val n = BigInt(rows.size)
    val perDoc = rows.map(_.toLowerCase.split(" ").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val totals = perDoc.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val head = totals.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    head.sorted.map { w =>
      val cs = perDoc.map(_.getOrElse(w, 0L)).filter(_ > 0)
      val df = cs.size.toLong
      val sc = BigInt(cs.sum)
      val sc2 = cs.map(c => BigInt(c) * c).sum
      (w, df, cs.sum,
        (BigInt(1000000) * sc / n).toLong,
        (BigInt(1000) * (n * sc2 - sc * sc) / (n * sc)).toLong)
    }
  }

  private def run(rows: Seq[String]): Seq[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fano").toString
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q200.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    TextMining.release(spark)
    out
  }

  test("matches the brute force: clumped vs spread vs sub-head words") {
    // "spam" is clumped (8 in one doc of 4), "the" spread (2 each),
    // filler words w00..w25 push one word out of the head-20 cutoff
    val filler = (0 until 26).map(i => f"w$i%02d").mkString(" ")
    val rows = Seq(
      "spam spam spam spam spam spam spam spam the the",
      "the the x", "the the y", s"the the $filler")
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    // and the engineered contrast is visible: fano(spam) >> fano(the)
    val fano = got.map(r => r._1 -> r._5).toMap
    assert(fano("spam") > 1000 && fano("spam") > fano("the"))
  }

  test("fixture: 20 head rows, moment identities, dispersion positive") {
    val out = q200.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (df, nw, fano) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(df >= 1 && nw >= df)
      assert(fano >= 0) // variance is non-negative
    }
    TextMining.release(spark)
  }
}
