package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q165's Wasserstein-1 length-profile matrix:
  * the engine's integer cross-multiplied ECDF sum must equal the
  * hand-computed optimal-transport cost on distributions small enough
  * to solve by eye, the identical-distribution pair must read exactly
  * 0 (and still be PRESENT — the lead-null guard keeps single-support
  * pairs in the output), and the full matrix covers every ordered
  * pair. */
class W1Spec extends SparkSpec {

  private val q165 = graft.SparkEntry.all.find(_.name == "q165_source_w1_lengths").get

  private def doc(tokens: Int): String = (1 to tokens).map(i => s"w$i").mkString(" ")

  test("W1 equals the hand-computed transport cost; identical pairs read 0 and stay present") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("w1").toString
    // s1: lengths {2,2,4}; s2: {2,6,6}; s3,s4: both all-3s (identical)
    val rows =
      Seq((1L, doc(2), "s1"), (2L, doc(2), "s1"), (3L, doc(4), "s1"),
        (4L, doc(2), "s2"), (5L, doc(6), "s2"), (6L, doc(6), "s2"),
        (7L, doc(3), "s3"), (8L, doc(3), "s3"),
        (9L, doc(3), "s4"), (10L, doc(3), "s4"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q165.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out.size == 6, s"C(4,2) ordered pairs expected: $out")
    // s1 {2:2/3, 4:1/3} vs s2 {2:1/3, 6:2/3}: move 1/3 mass 2->6 (4/3)
    // + 1/3 mass 4->6 (2/3) = 2.0 tokens
    assert(out(("s1", "s2")) == 2000000L, out.toString)
    // s1 vs s3 {3:1}: 2/3 mass 2->3 + 1/3 mass 4->3 = 1.0
    assert(out(("s1", "s3")) == 1000000L, out.toString)
    // identical single-support distributions: 0, and the row EXISTS
    assert(out(("s3", "s4")) == 0L, out.toString)
    graft.llm.TextMining.release(spark)
  }
}
