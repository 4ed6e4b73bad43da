package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q184's curriculum interleave: the closed-form global rank
  * must equal the brute-force row_number over (p, source) computed
  * independently in Scala, and the output must be a permutation with
  * the round-robin property (positions strictly alternate sources in
  * (p, source) lex order). */
class CurriculumSpec extends SparkSpec {

  private val q184 = graft.SparkEntry.all.find(_.name == "q184_curriculum_interleave").get

  private def brute(rows: Seq[(Long, String, Long)]): Map[Long, (Long, Long)] = {
    // per-source position by (nt, doc_id), then lex rank of (p, source)
    val withP = rows.groupBy(_._2).flatMap { case (_, docs) =>
      docs.sortBy(d => (d._3, d._1)).zipWithIndex.map { case (d, i) =>
        (d._1, d._2, i + 1L)
      }
    }.toSeq
    val ranked = withP.sortBy { case (id, src, p) => (p, src) }.zipWithIndex
    ranked.map { case ((id, _, p), i) => id -> (p, i + 1L) }.toMap
  }

  test("matches the brute-force interleave on an uneven corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curric").toString
    // uneven sources (7/3/1 docs), duplicate lengths to exercise ties
    val rows = Seq(
      (1L, "a b c", "s1"), (2L, "a b", "s1"), (3L, "a b c d e", "s1"),
      (4L, "a", "s1"), (5L, "a b c", "s1"), (6L, "x", "s1"), (7L, "x y", "s1"),
      (10L, "k l m n", "s2"), (11L, "k", "s2"), (12L, "k l", "s2"),
      (20L, "z", "s3"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val expect = brute(rows.map { case (id, t, src) =>
      (id, src, t.split(" ").count(_.nonEmpty).toLong) })
    val out = q184.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == expect, s"got $out\nexpected $expect")
    graft.llm.TextMining.release(spark)
  }

  test("fixture: global_rank is a permutation and interleave is fair") {
    val dir = "/root/testdata/sf0.001"
    val out = q184.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // permutation 1..N
    assert(out.map(_._4).sorted.toSeq == (1L to out.length).toSeq)
    // within one source, global order follows per-source position
    out.groupBy(_._2).values.foreach { docs =>
      val sorted = docs.sortBy(_._3)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
    }
    // round-robin: every source with >= p docs appears in the first
    // |{s : n_s >= 1}| + |{s : n_s >= 2}| + ... positions exactly once
    // per layer — equivalently, sorting by global_rank groups layer p
    // before layer p+1
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq,
      "curriculum layers must be non-decreasing in global order")
    graft.llm.TextMining.release(spark)
  }
}
