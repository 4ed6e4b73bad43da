package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Z-order layout operator (round 13): the Morton key's bit
  * math, and — the reason the operator exists — the QUANTIFIED layout
  * property: files written in z-order carry tight min/max ranges on
  * BOTH clustered columns, where a linear sort on one column leaves
  * every file spanning the other's full range. */
class ZOrderSpec extends SparkSpec {

  test("zvalue: known interleavings and box-locality of the Morton curve") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L),
      (3L, 5L), (255L, 255L))
    val out = rows.toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 8).as("z")).as[Long].collect()
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).sum
    assert(out.toSeq == rows.map { case (a, b) => ref(a, b) })
    // spot values: z(1,0)=2 (a-bit at position 1), z(0,1)=1, z(255,255)=65535
    assert(ref(1, 0) == 2L && ref(0, 1) == 1L && ref(255, 255) == 65535L)
  }

  test("z-ordered files bound BOTH columns; linear-sorted files bound only the sort column") {
    import scala.jdk.CollectionConverters._
    val df = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zDir = base.resolve("z").toString
    val linDir = base.resolve("lin").toString
    val files = 8
    Layout.writeZOrdered(df, "pc", "sz", 20, files, zDir)
    df.repartitionByRange(files, col("pc")).sortWithinPartitions("pc")
      .write.mode("overwrite").parquet(linDir)

    // per-output-file [min,max] of the SECONDARY column, normalized by
    // its global range — the footer stats a scan's pruning sees
    def avgSzSpan(dir: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("sz") - min("sz")).cast("double").as("span"))
        .select("span").collect().map(_.getDouble(0))
      spans.sum / spans.length
    }
    val global = df.agg((max("sz") - min("sz")).cast("double")).first().getDouble(0)
    val zSpan = avgSzSpan(zDir) / global
    val linSpan = avgSzSpan(linDir) / global
    // linear layout: every pc-sorted file spans essentially all sizes
    assert(linSpan > 0.9, f"linear layout unexpectedly bounds sz: $linSpan%.2f")
    // z-layout: each z-range is a union of small (pc, sz) boxes — the
    // average per-file sz span must be materially tighter
    assert(zSpan < 0.75 * linSpan,
      f"z-order did not tighten per-file sz ranges: z=$zSpan%.2f lin=$linSpan%.2f")
    // and the clustering must not cost the primary column its bounds:
    // per-file pc spans stay far below global under BOTH layouts is
    // not required — only that z-order keeps pc reasonably bounded too
    def avgPcSpan(dir: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("pc") - min("pc")).cast("double").as("span"))
        .select("span").collect().map(_.getDouble(0))
      spans.sum / spans.length
    }
    val globalPc = df.agg((max("pc") - min("pc")).cast("double")).first().getDouble(0)
    assert(avgPcSpan(zDir) / globalPc < 0.9,
      "z-order left the primary column unbounded per file")
  }
}
