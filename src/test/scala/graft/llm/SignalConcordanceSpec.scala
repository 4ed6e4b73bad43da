package graft.llm

import graft.SparkSpec

/** Gate for q210's length↔quality concordance: every source row must
  * match a brute force that ENUMERATES all doc pairs over the deciled
  * signals (the quadrant-sum identity the operator uses instead);
  * engineered sources pin the endpoints — a monotone length↔TTR
  * source reads positive tau, an anti-monotone one negative, a
  * constant-TTR source zero, a singleton NULL. */
class SignalConcordanceSpec extends SparkSpec {

  private val q210 =
    graft.SparkEntry.all.find(_.name == "q210_signal_concordance").get

  private def brute(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Option[Long])] = {
    val scored = rows.flatMap { case (src, t) =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((src, toks.length.toLong, 1000000L * toks.distinct.length / toks.length))
    }
    scored.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.size.toLong
      def deciles(vs: Seq[Long]): Seq[Long] =
        vs.map(v => 10L * vs.count(_ < v) / n)
      val dx = deciles(ds.map(_._2))
      val dy = deciles(ds.map(_._3))
      val pairs = for (i <- ds.indices; j <- ds.indices if i < j) yield (i, j)
      val conc = pairs.count { case (i, j) =>
        (dx(i) - dx(j)) * (dy(i) - dy(j)) > 0
      }.toLong
      val disc = pairs.count { case (i, j) =>
        (dx(i) - dx(j)) * (dy(i) - dy(j)) < 0
      }.toLong
      val tau = if (n < 2) None
        else Some((BigInt(1000) * (conc - disc) * 2 / (BigInt(n) * (n - 1))).toLong)
      (src, n, conc, disc, tau)
    }
  }

  private def run(rows: Seq[(String, String)]): Seq[(String, Long, Long, Long, Option[Long])] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    rows.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    q210.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
  }

  test("matches the pair-enumerating brute force; endpoints pinned") {
    // mono: longer docs have HIGHER ttr (distinct words grow with length)
    val mono = (1 to 8).map(k => ("mono",
      ((0 until k * 4).map(i => s"w$i") ++ Seq.fill(4)("pad")).mkString(" ")))
    // anti: longer docs REPEAT one word more (ttr falls with length)
    val anti = (1 to 8).map(k => ("anti",
      (Seq("a", "b", "c") ++ Seq.fill(k * 5)("spam")).mkString(" ")))
    // flat: ttr identical everywhere -> zero concordance either way
    val flat = (1 to 6).map(k => ("flat", (0 until k).map(i => s"u$i").mkString(" ")))
    val solo = Seq(("solo", "one two three"))
    val rows = mono ++ anti ++ flat ++ solo
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.map(r => r._1 -> r._5).toMap
    assert(m("mono").exists(_ > 500) && m("anti").exists(_ < -500))
    assert(m("flat").contains(0L) && m("solo").isEmpty)
  }

  test("fixture: matches the brute force end to end") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.core.T.df(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val got = q210.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == brute(rows), s"got $got")
  }
}
