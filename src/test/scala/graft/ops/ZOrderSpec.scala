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

  // per-z-key grid-cell count: how many distinct z-cells the layout
  // actually spreads rows over — a collapsed grid puts everything in
  // a handful of cells and the layout stops bounding anything
  private def distinctCells(keyed: org.apache.spark.sql.DataFrame): Long =
    keyed.select(countDistinct(col("zval"))).first().getLong(0)

  test("sketch bounds match the exact grid on clean data (round 14)") {
    val df = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
    val exact = distinctCells(Layout.withZKey(df, "pc", "sz", 8))
    val sketch = distinctCells(Layout.withZKeySketch(df, "pc", "sz", 8))
    // same resolution regime: the sketch grid spans where the mass is,
    // so cell occupancy is within a small factor of the exact grid
    assert(sketch.toDouble / exact > 0.8 && sketch.toDouble / exact < 1.25,
      s"sketch grid degenerated on clean data: exact=$exact sketch=$sketch")
  }

  test("a poisoned sentinel collapses the exact grid; the sketch grid survives") {
    import spark.implicits._
    val clean = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
    // one corrupted record: a 2^40-cents sentinel (the kind a broken
    // upstream writes exactly once in 100 TB). Kept inside the exact
    // path's 2^53/top exactness envelope — a bigger sentinel now fails
    // the exact path LOUDLY via the scaled() require, which is itself
    // the fragility the sketch path exists to remove.
    val poisoned = clean.unionByName(
      Seq((-1L, 1L << 40, 9999L)).toDF("p_partkey", "pc", "sz"))
    val exactCells = distinctCells(Layout.withZKey(poisoned, "pc", "sz", 8))
    val sketchCells = distinctCells(Layout.withZKeySketch(poisoned, "pc", "sz", 8))
    val cleanCells = distinctCells(Layout.withZKey(clean, "pc", "sz", 8))
    // exact bounds: every real pc scales to cell 0 -> pc resolution is
    // gone and occupied cells collapse toward |distinct sz buckets|
    assert(exactCells < cleanCells / 4,
      s"expected the sentinel to collapse the exact grid: $exactCells vs clean $cleanCells")
    // sketch bounds: the grid still spans the mass; the sentinel lands
    // clamped in an edge cell
    assert(sketchCells.toDouble / cleanCells > 0.8,
      s"sketch grid should survive the sentinel: $sketchCells vs clean $cleanCells")
  }
}
