package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the total-decode quarantine contract (round 13, VERDICT r12
  * item 4): both ImageIO failure modes fold to counted quarantine rows
  * — never an executor exception — and valid PNG/JPEG payloads decode
  * with exact dimensions through the same path.
  */
class MediaQuarantineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def png(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      (8 + id % 9).toInt, (8 + id % 7).toInt,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeSafe: valid PNG and JPEG decode ok with exact dims") {
    val p = Multimodal.MediaCodec.decodeSafe(5L, "image/png", png(5L))
    assert(p.status == "ok" && p.width.contains(13) && p.height.contains(13))
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val j = Multimodal.MediaCodec.decodeSafe(1L, "image/jpeg", bos.toByteArray)
    assert(j.status == "ok" && j.width.contains(17) && j.height.contains(9)
      && j.n_px.contains(153L))
  }

  test("decodeSafe: magic-less garbage (null-return mode) quarantines") {
    val garbage = Array.tabulate[Byte](64)(i => ((31 + i * 7) % 251).toByte)
    val q = Multimodal.MediaCodec.decodeSafe(7L, "image/png", garbage)
    assert(q.status == "quarantined" && q.width.isEmpty && q.n_px.isEmpty)
  }

  test("decodeSafe: truncated PNG (throwing mode) quarantines") {
    val whole = png(3L)
    val q = Multimodal.MediaCodec.decodeSafe(3L, "image/png",
      whole.take(whole.length / 2))
    assert(q.status == "quarantined" && q.width.isEmpty)
  }

  test("q129 fixture: per-kind counts and statuses match the formula") {
    import spark.implicits._
    val payloads = Multimodal.mixedTable(spark, dir)
      .select(col("doc_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
    val out = Multimodal.MediaBatch.decodeImagesSafe(payloads).cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.count() == nDocs) // total decode: every payload lands as a row
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expQuar = out.filter(col("doc_id") % 4 === 3).count()
    assert(byStatus("quarantined") == expQuar && expQuar > 0)
    // every non-corrupt row decodes with the formula's exact dims
    val bad = out.filter(col("status") === "ok" &&
      (col("width") =!= (col("doc_id") % 9 + 8).cast("int") ||
        col("height") =!= (col("doc_id") % 7 + 8).cast("int"))).count()
    assert(bad == 0)
    // both corrupt sub-modes are present in the fixture
    assert(out.filter(col("doc_id") % 8 === 3).count() > 0)
    assert(out.filter(col("doc_id") % 8 === 7).count() > 0)
    out.unpersist()
  }
}
