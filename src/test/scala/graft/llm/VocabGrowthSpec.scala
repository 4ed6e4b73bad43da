package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q168's vocabulary growth curve: on a hand
  * corpus where every trigram's first-appearance decile is computable
  * by eye, the census and its cumulative sum must match exactly; on
  * the real fixture the curve must be monotone with the final
  * cumulative equal to the corpus's distinct-trigram count. */
class VocabGrowthSpec extends SparkSpec {

  private val q168 = graft.SparkEntry.all.find(_.name == "q168_vocab_growth").get

  test("hand corpus: first-appearance deciles and cumulative counts exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vgrow").toString
    // ids 0..9 -> decile = id. Grams: doc0 "a b c" introduces (a b c);
    // doc5 "a b c d" re-sees (a b c), introduces (b c d); doc9
    // "x y z" introduces (x y z). Docs 1-4,6-8 too short for grams.
    val rows = (0L to 9L).map {
      case 0L => (0L, "a b c")
      case 5L => (5L, "a b c d")
      case 9L => (9L, "x y z")
      case i  => (i, "t u")
    }
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q168.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 1L), (5L, 1L, 2L), (9L, 1L, 3L)), out.mkString(";"))
  }

  test("real fixture: monotone cumulative, total equals distinct gram count") {
    val out = q168.run(spark, "/root/testdata/sf0.001").collect()
    val cums = out.map(_.getLong(2))
    assert(cums.sameElements(cums.sorted), "cumulative must be monotone")
    assert(out.map(_.getLong(1)).sum == cums.last, "census must sum to the cumulative total")
    assert(cums.last > 0)
  }
}
