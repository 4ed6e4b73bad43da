package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q185's LSH band-bucket census: identical docs share all 16
  * band keys (so a k-clone corpus shows a size-k bucket in EVERY
  * band), each band's histogram partitions the shingled doc
  * population, and the candidate-pair arithmetic is C(size,2) exactly. */
class BandCensusSpec extends SparkSpec {

  private val q185 = graft.SparkEntry.all.find(_.name == "q185_lsh_band_census").get

  test("clone corpus: every band carries the full clone bucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bandcen").toString
    val ta = (1 to 15).map(i => s"w$i").mkString(" ")
    val tb = (1 to 8).map(i => s"q$i").mkString(" ")
    // 5 clones of one content + 1 distinct doc
    ((1 to 5).map(i => (i.toLong, ta)) :+ (9L, tb))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q185.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bands = out.map(_._1).distinct.sorted
    assert(bands.toSeq == (0L to 15L), s"all 16 bands present: $bands")
    for (b <- 0L to 15L) {
      val hist = out.filter(_._1 == b)
      // the 5 clones hash identically in every band; the distinct doc
      // may or may not collide with them
      assert(hist.exists(h => h._2 >= 5L && h._3 >= 1L), s"band $b: $hist")
      // each band's histogram partitions the 6 shingled docs
      assert(hist.map(h => h._2 * h._3).sum == 6L, s"band $b mass: $hist")
      // candidate arithmetic
      hist.foreach(h => assert(h._4 == h._2 * (h._2 - 1) / 2 * h._3))
    }
    graft.llm.LlmText.release(spark)
  }

  test("fixture: per-band mass equals the shingled doc count") {
    val dir = "/root/testdata/sf0.001"
    val out = q185.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val masses = out.groupBy(_._1).view.mapValues(_.map(h => h._2 * h._3).sum).toMap
    assert(masses.size == 16 && masses.values.toSet.size == 1,
      s"every band partitions the same population: $masses")
    out.foreach(h => assert(h._4 == h._2 * (h._2 - 1) / 2 * h._3))
    graft.llm.LlmText.release(spark)
  }
}
