package graft.llm

import graft.SparkSpec

/** Gate for q206's contamination attribution: the per-source top-3
  * benchmark-doc evidence table must match a set-logic brute force on
  * a hand corpus with an engineered two-benchmark leak (one source
  * copies bench A, another copies bench B, one doc mixes both —
  * attribution must name the right owner first); on the fixture the
  * attributed population must reconcile with q62's contaminated set. */
class ContamAttributionSpec extends SparkSpec {

  private val q206 =
    graft.SparkEntry.all.find(_.name == "q206_contamination_attribution").get

  /** (source, rk, bench_doc, n_evidence, n_docs) via shingle sets. */
  private def brute(dir: String): Seq[(String, Long, Long, Long, Long)] = {
    val sh = LlmText.docShingles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val srcOf = graft.core.T.df(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bench = sh.filter(_._1 % 20 == 0)
    val benchUnion = bench.values.foldLeft(Set.empty[Long])(_ ++ _)
    val flagged = sh.keys.filter(id => id % 20 != 0 &&
      2 * sh(id).count(benchUnion) >= sh(id).size).toSeq
    val att = (for {
      id <- flagged; s <- sh(id).toSeq; (bd, bsh) <- bench.toSeq if bsh(s)
    } yield (srcOf(id), bd, id))
    att.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((src, bd), es) =>
        (src, bd, es.size.toLong, es.map(_._3).distinct.size.toLong)
      }
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((src, bd, ev, nd), i) => (src, i + 1L, bd, ev, nd) }
      }
  }

  private def run(dir: String): Seq[(String, Long, Long, Long, Long)] =
    q206.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

  test("hand corpus: the right benchmark doc is named first per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    val benchA = (0 until 50).map(i => s"qa$i").mkString(" ")
    val benchB = (0 until 50).map(i => s"qb$i").mkString(" ")
    val rows = Seq(
      (0L, "bench", benchA), (20L, "bench", benchB),
      (1L, "webA", benchA),                          // pure A leak
      (2L, "webB", benchB + " tail"),                // pure B leak
      (3L, "webA", benchA + " " + benchB),           // mixed: A and B tie-ish
      (4L, "clean", (0 until 50).map(i => s"cl$i").mkString(" ")))
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val (got, want) = (run(dir), brute(dir))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.groupBy(_._1)
    assert(m("webA").head._3 == 0L)   // bench doc 0 named first for webA
    assert(m("webB").head._3 == 20L)  // bench doc 20 named first for webB
    assert(!m.contains("clean"))
    LlmText.release(spark)
  }

  test("fixture: matches the brute force end to end") {
    val dir = "/root/testdata/sf0.001"
    val (got, want) = (run(dir), brute(dir))
    assert(got == want, s"got $got\nexpected $want")
    LlmText.release(spark)
  }
}
