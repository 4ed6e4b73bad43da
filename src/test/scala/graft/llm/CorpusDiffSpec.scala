package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q171's corpus version diff: a hand corpus
  * whose ids hit every derivation class exactly once each, so the
  * status census and token masses are computable by eye. */
class CorpusDiffSpec extends SparkSpec {

  private val q171 = graft.SparkEntry.all.find(_.name == "q171_corpus_version_diff").get

  test("added/removed/changed/unchanged census exact on a hand corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdiff").toString
    // id 7: removed (7%7=0). id 6: changed (6%5=1). id 3: unchanged in
    // place AND cloned as an added doc (3%11=3). id 2: unchanged.
    val rows = Seq(
      (2L, "two tok", "s"),          // unchanged, 2 tokens
      (3L, "three tokens here", "s"), // unchanged + clone added (3 tokens)
      (6L, "six words a b c d", "s"), // changed -> +" updated" = 7 tokens in v2
      (7L, "gone now", "s"))          // removed, 2 tokens
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q171.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "added" -> ((1L, 3L)),      // id 3 clone at 8+3
      "removed" -> ((1L, 2L)),    // id 7
      "changed" -> ((1L, 7L)),    // id 6, v2 token count
      "unchanged" -> ((2L, 5L))), // ids 2 and 3
      out.toString)
  }
}
