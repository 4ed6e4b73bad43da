package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q160: the histogram-derived decile buckets
  * and the blend ordering must match a plain-Scala reimplementation
  * of the SAME integer arithmetic (decile = (10·|strictly below|)
  * div N per signal, blend = sum, top-20 by (blend desc, doc_id)). */
class QualityBlendSpec extends SparkSpec {

  private val q160 = graft.SparkEntry.all.find(_.name == "q160_quality_blend").get

  private def stage(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qb").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def brute(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long)] = {
    val sig = rows.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val n = ws.length.toLong
      (id, n, 1000L * ws.distinct.length / n, text.length.toLong / n)
    }
    val nt = sig.size.toLong
    def dec(vs: Seq[Long]): Map[Long, Long] =
      vs.distinct.map(v => v -> 10L * vs.count(_ < v) / nt).toMap
    val (d1, d2, d3) = (dec(sig.map(_._2)), dec(sig.map(_._3)), dec(sig.map(_._4)))
    sig.map { case (id, v1, v2, v3) =>
      (id, d1(v1), d2(v2), d3(v3), d1(v1) + d2(v2) + d3(v3))
    }.sortBy { case (id, _, _, _, b) => (-b, id) }.take(20)
  }

  test("q160 equals the plain-Scala decile pipeline on 5 random corpora") {
    val rnd = new scala.util.Random(31)
    (0 until 5).foreach { t =>
      val rows = (0 until 80).map { k =>
        // variable length, variable repetition, variable word length
        val univ = 3 + rnd.nextInt(20)
        val toks = (0 until 4 + rnd.nextInt(30))
          .map(_ => "w" * (1 + rnd.nextInt(6)) + rnd.nextInt(univ))
        (k.toLong, toks.mkString(" "))
      }
      val got = q160.run(spark, stage(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      graft.Caches.releaseAll(spark)
      assert(got == brute(rows), s"trial $t:\n got $got\n exp ${brute(rows)}")
    }
  }

  test("uniform corpus puts every doc in decile 0 on every signal") {
    val rows = (0 until 30).map(k => (k.toLong, "a b c d e"))
    val got = q160.run(spark, stage(rows)).collect()
    graft.Caches.releaseAll(spark)
    assert(got.length == 20)
    assert(got.forall(r => r.getLong(4) == 0L),
      s"identical docs must all sit at blend 0: ${got.toSeq}")
    // tie-break: lowest doc_ids first
    assert(got.map(_.getLong(0)).toSeq == (0L until 20L), s"${got.toSeq}")
  }
}
