package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gates for the round-16 corpus screens: q173 head
  * coverage, q174 declared-language agreement, q175 embedding-norm
  * health, q176 dup-cluster source composition — each on a hand
  * fixture where the answer is computable by eye. */
class CorpusScreensSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("screens").toString
    rows.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q173: head coverage exact on a 3-type vocabulary") {
    // occurrences: a×5, b×3, c×1 -> total 9; every k >= 10 covers all
    val dir = writeDocs(Seq(
      (1L, "a a a b b c", "en", "s"), (2L, "a a b", "en", "s")))
    val out = q("q173_head_coverage").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 4)
    out.foreach { case (k, (covered, total, milli)) =>
      assert(covered == 9L && total == 9L && milli == 1000L, s"k=$k")
    }
    graft.llm.TextMining.release(spark)
  }

  test("q173: real fixture is monotone in k with a steep head") {
    val out = q("q173_head_coverage").run(spark, "/root/testdata/sf0.001").collect()
    val milli = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(milli.sameElements(milli.sorted), "coverage must grow with k")
    assert(milli.last <= 1000L && milli.head > 0L)
    graft.llm.TextMining.release(spark)
  }

  test("q174: agreement census exact — a mislabeled slice reads 0") {
    val en = "the cat of a house and the dog in a yard"
    val dir = writeDocs(Seq(
      (1L, en, "en", "s"),   // correctly labeled
      (2L, en, "en", "s"),   // correctly labeled
      (3L, en, "de", "s")))  // English text labeled de -> mismatch
    val out = q("q174_langid_agreement").run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("s", "en")) == ((2L, 2L, 1000L)), out.toString)
    assert(out(("s", "de")) == ((1L, 0L, 0L)), out.toString)
    graft.llm.LlmText.release(spark) // q174 now persists the confusion matrix
  }

  test("q175: norms exact in milli^2; zero vectors counted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("norms").toString
    Seq((1L, Seq(1.0f, 2.0f), 0), (2L, Seq(0.0f, 0.0f), 0), (3L, Seq(3.0f, 4.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = q("q175_embedding_norms").run(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // label 0: nsq {5_000_000, 0} -> min 0, max 5e6, mean 2.5e6, zeros 1
    assert(out(0) == ((2L, 0L, 5000000L, 2500000L, 1L)), out.toString)
    // label 1: 9e6 + 16e6 = 25e6
    assert(out(1) == ((1L, 25000000L, 25000000L, 25000000L, 0L)), out.toString)
  }

  test("q176: cluster source composition separates mirrors from re-posts") {
    val clone = (1 to 8).map(i => s"c$i").mkString(" ")
    val other = (1 to 8).map(i => s"d$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, clone, "en", "A"), (2L, clone, "en", "A"), (3L, clone, "en", "B"),
      (4L, other, "en", "B"), (5L, other, "en", "B")))
    val out = q("q176_cluster_sources").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cluster {1,2,3}: size 3 across A,B -> (3,2); cluster {4,5}: size 2 in B -> (2,1)
    assert(out == Map((3L, 2L) -> 1L, (2L, 1L) -> 1L), out.toString)
    graft.llm.LlmText.release(spark)
  }

  test("q181: char-class shares and fertility exact on a hand corpus") {
    // en: "ab 12 c!" -> 8 chars: alpha 3, digit 2, space 2, other 1; 3 tokens
    // de: "xyz" -> 3 chars all alpha, 1 token
    val dir = writeDocs(Seq(
      (1L, "ab 12 c!", "en", "s"), (2L, "xyz", "de", "s")))
    val out = q("q181_char_classes").run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(out("en") == ((1L, 8L, 3L, 2666L, 375L, 250L, 250L, 125L)), out.toString)
    assert(out("de") == ((1L, 3L, 1L, 3000L, 1000L, 0L, 0L, 0L)), out.toString)
  }

  test("q181: class shares partition every character (sum = 1000 within truncation)") {
    val out = q("q181_char_classes").run(spark, "/root/testdata/sf0.001").collect()
    out.foreach { r =>
      val sum = r.getLong(5) + r.getLong(6) + r.getLong(7) + r.getLong(8)
      assert(sum >= 996L && sum <= 1000L, s"${r.getString(0)}: share sum $sum")
    }
  }
}
