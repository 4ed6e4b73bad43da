package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q162: the vocab-side pair census must equal a
  * plain-Scala brute force over the raw corpus (lowercase whitespace
  * tokens → per-word adjacent char pairs × corpus frequency), pinning
  * both the Heaps-side counting trick and the (cnt desc, a, b)
  * ordering contract. */
class BpePairSpec extends SparkSpec {

  private val q162 = graft.SparkEntry.all.find(_.name == "q162_bpe_pair_counts").get

  private def stage(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def brute(rows: Seq[(Long, String)]): Seq[(String, String, Long)] =
    rows.flatMap(_._2.toLowerCase.split(" ").filter(_.nonEmpty))
      .flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, c) => (p.substring(0, 1), p.substring(1, 2), c) }
      .sortBy { case (a, b, c) => (-c, a, b) }
      .take(20)

  test("q162 equals the brute-force corpus-side pair count on 5 random corpora") {
    val rnd = new scala.util.Random(53)
    (0 until 5).foreach { t =>
      val rows = (0 until 60).map { k =>
        val toks = (0 until 5 + rnd.nextInt(20)).map { _ =>
          (0 until 1 + rnd.nextInt(7))
            .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        }
        (k.toLong, toks.mkString(" "))
      }
      val got = q162.run(spark, stage(rows)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      graft.llm.TextMining.release(spark)
      assert(got == brute(rows), s"trial $t:\n got $got\n exp ${brute(rows)}")
    }
  }

  test("single-char words contribute nothing; repeated words count by frequency") {
    // "ab" appears 3x, "a" (no pair) 5x: the only pair is (a,b) at 3
    val rows = Seq((1L, "ab a a ab"), (2L, "a ab a a"))
    val got = q162.run(spark, stage(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    graft.llm.TextMining.release(spark)
    assert(got == Seq(("a", "b", 3L)), s"got $got")
  }
}
