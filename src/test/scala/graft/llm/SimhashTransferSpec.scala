package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q172's SimHash→Jaccard transfer table: exact duplicates
  * sit at hamming 0 with Jaccard exactly 1000 milli, so the hamming-0
  * row's min/mean/max must all read 1000 on a clone-only corpus; on
  * the real fixture every row respects the structural bounds and the
  * pair counts reconcile with q66's pair listing. */
class SimhashTransferSpec extends SparkSpec {

  private val q172 = graft.SparkEntry.all.find(_.name == "q172_simhash_jaccard_transfer").get
  private val q66 = graft.SparkEntry.all.find(_.name == "q66_dedup_simhash_ham").get

  test("clone-only corpus: hamming 0, Jaccard exactly 1000 everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shtrans").toString
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, text, "s"), (2L, text, "s"), (3L, text, "s"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q172.run(spark, dir).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 3L, "C(3,2) pairs at hamming 0")
    assert(r.getLong(2) == 1000L && r.getLong(3) == 1000L && r.getLong(4) == 1000L)
    graft.llm.LlmText.release(spark)
  }

  test("real fixture: bounds hold and pair counts reconcile with q66") {
    val dir = "/root/testdata/sf0.001"
    val out = q172.run(spark, dir).collect()
    val q66pairs = q66.run(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 2L)
      assert(r.getLong(2) <= r.getLong(4) && r.getLong(4) <= r.getLong(3),
        s"min <= mean <= max violated: $r")
      assert(r.getLong(2) >= 0L && r.getLong(3) <= 1000L)
    }
    // every transfer pair comes from q66's emission; the size join may
    // only SHRINK the set (shingle-less docs excluded)
    assert(out.map(_.getLong(1)).sum <= q66pairs.length)
    graft.llm.LlmText.release(spark)
  }

  test("direct and collapsed verification agree on fixture and clones") {
    import spark.implicits._
    def table(jm: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long, Long)] =
      jm.groupBy("hamming")
        .agg(sum("m").as("n_pairs"), min("jm").as("min_jm"),
          max("jm").as("max_jm"), sum(col("jm") * col("m")).as("sum_jm"))
        .orderBy("hamming")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    // the real fixture (mostly-distinct regime)
    val fx = "/root/testdata/sf0.001"
    assert(table(graft.llm.LlmText.transferJmDirect(spark, fx)) ==
      table(graft.llm.LlmText.transferJmCollapsed(spark, fx)))
    graft.llm.LlmText.release(spark)
    // a clone-heavy corpus (collapse regime): 3 contents × 4 clones,
    // contents near-identical so cross-class hamming ≤ 2 pairs exist
    val dir = java.nio.file.Files.createTempDirectory("shtrans2").toString
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val rows = for (c <- 0 until 3; k <- 0 until 4) yield
      (c * 4 + k + 1L, s"$base extra$c", "en", "s", 10L)
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(table(graft.llm.LlmText.transferJmDirect(spark, dir)) ==
      table(graft.llm.LlmText.transferJmCollapsed(spark, dir)))
    graft.llm.LlmText.release(spark)
  }
}
