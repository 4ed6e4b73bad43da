package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q204's streaming decontamination census: the end-to-end
  * stream (stage → micro-batches → bloom prefilter → exact verify →
  * exactly-once store → census) must match a set-logic brute force on
  * a hand corpus with an engineered contaminated copy, a clean doc,
  * and a shingle-less short doc; decisions must be batching-invariant
  * (1-batch ≡ 3-batch chunkings); the fixture census must obey the
  * counting laws. */
class StreamDeconGateSpec extends SparkSpec {

  private val q204 =
    graft.SparkEntry.all.find(_.name == "q204_stream_decon_gate").get

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    // the stream staging expects documents.parquet to be a single FILE
    // (like the driver fixtures), not a Spark output directory
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/_staging")
    val part = new java.io.File(s"$dir/_staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "documents.parquet"))
    dir
  }

  /** Set-logic brute force over the kernel shingle frames. */
  private def brute(dir: String): Seq[(String, Long, Long, Long, Option[Long])] = {
    val sh = graft.llm.LlmText.docShingles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val bench = sh.collect { case (id, s) if id % 20 == 0 => s }
      .foldLeft(Set.empty[Long])(_ ++ _)
    val srcOf = graft.core.T.df(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamed = srcOf.keys.filter(_ % 20 != 0).toSeq
    streamed.groupBy(srcOf).toSeq.sortBy(_._1).map { case (src, ids) =>
      val withSh = ids.filter(sh.contains)
      val flagged = withSh.count { id =>
        val s = sh(id); 2 * s.count(bench) >= s.size
      }
      (src, withSh.size.toLong, flagged.toLong, (ids.size - withSh.size).toLong,
        if (withSh.isEmpty) None else Some(1000L * flagged / withSh.size))
    }
  }

  test("hand corpus: contaminated copy flagged, clean passes, short doc fenced") {
    val benchText = (0 until 60).map(i => s"bm$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, "bsrc", benchText),                       // benchmark doc
      (20L, "bsrc", (0 until 40).map(i => s"bx$i").mkString(" ")),
      (1L, "web", benchText),                        // verbatim copy -> flagged
      (2L, "web", (0 until 50).map(i => s"cl$i").mkString(" ")), // clean
      (3L, "web", "a b"),                            // < 3 tokens -> n_short
      (4L, "wiki", benchText + " extra tail tokens here"))) // mostly copied
    val got = q204.run(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    val want = brute(dir)
    assert(got == want, s"got $got\nexpected $want")
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("web") == ("web", 2L, 1L, 1L, Some(500L)))
    assert(bySrc("wiki")._3 == 1L) // the mostly-copied doc is flagged
    graft.Caches.releaseAll(spark)
  }

  test("decisions are batching-invariant: one chunk equals three") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      (i.toLong, s"s${i % 3}", (0 until 40).map(j => s"t${i % 7}_$j").mkString(" "))
    }
    val dir = writeDocs(rows)
    val bn = StreamDeconGate.bench(spark, dir)
    val bloom = graft.plans.BloomKernels.buildBroadcast(spark, bn, "sh", bn.count(), 0.01)
    val all = rows.map { case (id, src, t) => (id, t, src) }
      .toDF("doc_id", "text", "source").filter(col("doc_id") % 20 =!= 0)
    def decided(chunks: Seq[org.apache.spark.sql.DataFrame]) =
      chunks.map(c => StreamDeconGate.decide(c, bn, bloom).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))))
        .reduce(_ ++ _).sortBy(_._1).toSeq
    val one = decided(Seq(all))
    val three = decided(Seq(all.filter(col("doc_id") % 3 === 0),
      all.filter(col("doc_id") % 3 === 1), all.filter(col("doc_id") % 3 === 2)))
    assert(one == three)
    graft.Caches.releaseAll(spark)
  }

  test("fixture: counting laws and totals reconcile with the gated population") {
    val dir = "/root/testdata/sf0.001"
    val out = q204.run(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(1) > 0)
        assert(r.getLong(4) == 1000L * r.getLong(2) / r.getLong(1))
      else assert(r.isNullAt(4))
    }
    val streamed = graft.core.T.df(spark, dir, "documents")
      .filter(col("doc_id") % 20 =!= 0).count()
    assert(out.map(r => r.getLong(1) + r.getLong(3)).sum == streamed)
    graft.Caches.releaseAll(spark)
  }
}
