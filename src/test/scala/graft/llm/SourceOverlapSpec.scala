package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q156: the hashed collect_set/pair-explode
  * pipeline must report EXACTLY the brute-force distinct-trigram
  * overlap computed on the raw trigram STRINGS (no hashing) — any
  * hash-domain bug (packing, truncation, collision handling) or
  * pair-enumeration bug (missed ordered pair, double count) diverges. */
class SourceOverlapSpec extends SparkSpec {

  private val q156 = graft.SparkEntry.all.find(_.name == "q156_source_overlap").get

  private def stage(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("srcov").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def grams(text: String): Set[Seq[String]] = {
    val ws = text.split(" ").filter(_.nonEmpty).toSeq
    if (ws.size < 3) Set.empty else ws.sliding(3).map(_.toSeq).toSet
  }

  private def brute(rows: Seq[(Long, String, String)]): Map[(String, String), (Long, Long, Long)] = {
    val bySrc = rows.groupBy(_._2).view
      .mapValues(_.map(r => grams(r._3)).foldLeft(Set.empty[Seq[String]])(_ ++ _)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      shared = (bySrc(srcs(i)) & bySrc(srcs(j))).size.toLong if shared > 0
      na = bySrc(srcs(i)).size.toLong; nb = bySrc(srcs(j)).size.toLong
    } yield (srcs(i), srcs(j)) ->
      (shared, 1000L * shared / (na + nb - shared), 1000L * shared / math.min(na, nb))).toMap
  }

  test("q156 equals the brute-force string-level overlap on 10 random corpora") {
    val rnd = new scala.util.Random(13)
    (0 until 10).foreach { t =>
      // 4 sources over a small token universe so overlaps actually occur
      val rows = (0 until 40).map { k =>
        val toks = (0 until 8 + rnd.nextInt(10)).map(_ => s"w${rnd.nextInt(12)}")
        (k.toLong, s"s${k % 4}", toks.mkString(" "))
      }
      val got = q156.run(spark, stage(rows)).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      graft.llm.TextMining.release(spark)
      assert(got == brute(rows), s"trial $t: got $got\nexpected ${brute(rows)}")
    }
  }

  test("a source embedded inside another reads containment 1000, Jaccard << 1000") {
    // s0 = one short doc; s1 = that doc verbatim plus much more text
    val core = (0 until 10).map(i => s"c$i").mkString(" ")
    val extra = (0 until 80).map(i => s"x$i").mkString(" ")
    val rows = Seq((1L, "s0", core), (2L, "s1", s"$core $extra"), (3L, "s1", extra))
    val r = q156.run(spark, stage(rows)).collect()
    graft.llm.TextMining.release(spark)
    assert(r.length == 1)
    assert(r.head.getLong(4) == 1000L, s"containment of the embedded source must saturate: ${r.head}")
    assert(r.head.getLong(3) < 200L, s"Jaccard must stay low for an embedding pair: ${r.head}")
  }

  test("sources with no shared trigram emit no pair row") {
    val rows = Seq((1L, "a", "p q r s t"), (2L, "b", "u v w x y"))
    val r = q156.run(spark, stage(rows)).collect()
    graft.llm.TextMining.release(spark)
    assert(r.isEmpty, s"disjoint sources must be absent, got ${r.toSeq}")
  }
}
