package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q166's LSH recall calibration: an exact-duplicate pair has
  * identical shingle sets, therefore identical 64-component signatures,
  * therefore ALL 16 bands colliding — bands_milli = 16000 — and the
  * theory prediction at J = 1 is 16·1⁴ = 16 bands exactly; any
  * deviation means the signature arithmetic or the band-equality fold
  * broke. Bounds hold for every bucket. */
class LshCalibSpec extends SparkSpec {

  private val q166 = graft.SparkEntry.all.find(_.name == "q166_lsh_recall_calib").get

  test("exact duplicates collide on all 16 bands and match the J=1 prediction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lshcal").toString
    val text = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (1 to 12).map(i => s"zzz$i").mkString(" ")
    val rows = Seq(
      (1L, text, "s"), (2L, text, "s"),   // exact dup pair, J = 1
      (3L, other, "s"), (4L, other, "s")) // second dup class
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q166.run(spark, dir).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getLong(0) == 10L, "bucket = J decile 10")
    assert(r.getLong(1) == 2L, "two exact-dup pairs")
    assert(r.getLong(2) == 16000L, "all 16 bands collide on identical sigs")
    assert(r.getLong(3) == 16000L, "prediction 16·J⁴ at J=1")
    graft.llm.LlmText.release(spark)
  }

  test("bucket rows respect the structural bounds on the real fixture") {
    val out = q166.run(spark, "/root/testdata/sf0.001").collect()
    out.foreach { r =>
      assert(r.getLong(0) >= 5L && r.getLong(0) <= 10L, s"bucket ${r.getLong(0)}")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 16000L)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 16000L)
      assert(r.getLong(1) >= 1L)
    }
    graft.llm.LlmText.release(spark)
  }
}
