package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q169's per-source dedup token yield: on a
  * hand corpus with known clone structure the dropped set is exactly
  * the non-representative cluster members, token masses attribute to
  * sources exactly, and a source with no duplicates reads yield
  * 1000 milli. */
class DedupYieldSpec extends SparkSpec {

  private val q169 = graft.SparkEntry.all.find(_.name == "q169_dedup_yield").get

  test("clone clusters drop non-representatives; yields exact per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyield").toString
    val clone = (1 to 8).map(i => s"c$i").mkString(" ")  // 8 tokens
    val uniqA = (1 to 6).map(i => s"a$i").mkString(" ")  // 6 tokens
    val uniqB = (1 to 4).map(i => s"b$i").mkString(" ")  // 4 tokens
    // cluster {1, 3, 5}: rep = 1 (min id). Docs 2 (src A) and 4 (src B) unique.
    val rows = Seq(
      (1L, clone, "A"), (2L, uniqA, "A"), (3L, clone, "A"),
      (4L, uniqB, "B"), (5L, clone, "B"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q169.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // A: docs {1,2,3}, tokens 8+6+8=22; doc 3 dropped (8 tokens) -> net 14
    assert(out("A") == ((3L, 22L, 1L, 8L, 14L, (1000L * 14) / 22)), out.toString)
    // B: docs {4,5}, tokens 4+8=12; doc 5 dropped -> net 4, yield 333
    assert(out("B") == ((2L, 12L, 1L, 8L, 4L, 333L)), out.toString)
    graft.llm.LlmText.release(spark)
  }

  test("a duplicate-free source keeps everything") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyield2").toString
    val rows = Seq((1L, "p q r s", "S"), (2L, "w x y z", "S"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = q169.run(spark, dir).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L, "no drops expected")
    assert(r.getLong(6) == 1000L, "full yield")
    graft.llm.LlmText.release(spark)
  }
}
