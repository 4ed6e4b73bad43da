package graft.llm

import graft.SparkSpec

/** Gate for q202's curriculum step-novelty decay: the per-step
  * (occurrence, first-occurrence, new-gram) census must match an exact
  * Scala brute force that independently re-derives the curriculum
  * order (per-source short-first position, round-robin interleave),
  * the 2048-token step boundaries, and the min-rank gram attribution —
  * on a hand corpus engineered so a later step re-grinds an earlier
  * step's grams; the fixture run must satisfy the conservation laws. */
class StepNoveltySpec extends SparkSpec {

  private val q202 = graft.SparkEntry.all.find(_.name == "q202_step_novelty").get

  /** (step, n_occ, n_novel_occ, n_new_grams, novelty_milli) */
  private def brute(rows: Seq[(Long, String, String)]): Seq[(Long, Long, Long, Long, Long)] = {
    val perDoc = rows.map { case (id, src, t) =>
      (id, src, t.split(" ").filter(_.nonEmpty).toSeq)
    }
    // per-source short-first position, tie by doc_id; global order (p, source)
    val withP = perDoc.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (d._3.size, d._1)).zipWithIndex.map { case (d, i) => (d, i + 1L) }
    }
    val ranked = withP.sortBy { case ((_, src, _), p) => (p, src) }.map(_._1)
    // exclusive token prefix -> step
    val offs = ranked.map(_._3.size.toLong).scanLeft(0L)(_ + _)
    val step = ranked.zip(offs).map { case (d, off) => (d, off / 2048L) }
    // gram stream in rank order; first occurrence by rank
    val grams = step.zipWithIndex.flatMap { case (((_, _, ws), st), gr) =>
      if (ws.size >= 3) ws.sliding(3).map(g => (g.mkString(" "), gr.toLong, st)).toSeq
      else Seq.empty
    }
    val firstRank = grams.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    grams.groupBy(_._3).toSeq.sortBy(_._1).map { case (st, gs) =>
      val novel = gs.filter(g => firstRank(g._1) == g._2)
      (st, gs.size.toLong, novel.size.toLong,
        novel.map(_._1).distinct.size.toLong, 1000L * novel.size / gs.size)
    }
  }

  private def run(rows: Seq[(Long, String, String)]): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stepnov").toString
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q202.run(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    TextMining.release(spark)
    out
  }

  test("matches the brute force: a later step re-grinds an earlier step's grams") {
    // all-unique words per doc, sized so the short-first curriculum puts
    // the verbatim re-grinder (doc 3 = doc 1 + fresh tail) in its OWN
    // later step: offsets 0 / 2000 / 4000 / 6500 -> steps 0, 0, 1, 3
    def doc(seed: Int, n: Int) = (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    val original = doc(1, 2000)
    val rows = Seq(
      (1L, "a", original),
      (2L, "b", doc(2, 2000)),
      (3L, "a", original + " " + doc(3, 500)),   // re-grinds doc 1 + adds new
      (4L, "b", doc(4, 2600)))
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    assert(got.length > 2) // the corpus really does span multiple steps
    // head step is all-novel; the re-ground step is visibly less novel
    assert(got.head._5 == 1000)
    assert(got.exists(_._5 < 500))
  }

  test("fixture: conservation laws — occurrence and new-gram masses add up") {
    val dir = "/root/testdata/sf0.001"
    val out = q202.run(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (_, occ, nov, newg, milli) =>
      assert(nov <= occ && newg <= nov)
      assert(milli == 1000L * nov / occ)
    }
    // sum of new grams over steps = corpus distinct grams; sum of
    // occurrences = corpus gram mass (computed independently)
    val docsDf = graft.core.T.df(spark, dir, "documents")
    import org.apache.spark.sql.functions._
    val ws = docsDf.select(expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr("transform(sequence(0, size(ws) - 3), i -> " +
        "concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("g"))
    val totalOcc = ws.count()
    val totalDistinct = ws.distinct().count()
    assert(out.map(_._2).sum == totalOcc)
    assert(out.map(_._4).sum == totalDistinct)
    TextMining.release(spark)
  }
}
