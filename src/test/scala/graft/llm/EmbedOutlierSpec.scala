package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q157: the quantize → integer-centroid →
  * integer-distance → top-3 pipeline must match a plain-Scala
  * reimplementation of the SAME integer arithmetic bit-for-bit
  * (HALF_UP quantization, truncating centroid quotient, int64
  * distance, (d2 desc, vec_id) tie-break). */
class EmbedOutlierSpec extends SparkSpec {

  private val q157 = graft.SparkEntry.all.find(_.name == "q157_embed_outliers").get

  private def stage(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("outl").toString
    rows.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The query's exact arithmetic in plain Scala. */
  private def brute(rows: Seq[(Long, Array[Float], Int)]): Seq[(Int, Long, Long, Long)] = {
    def q(x: Float): Long =
      BigDecimal(x.toDouble * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    rows.groupBy(_._3).toSeq.flatMap { case (label, vs) =>
      val dim = vs.head._2.length
      val n = vs.size.toLong
      val mu = (0 until dim).map(i => 1000L * vs.map(r => q(r._2(i))).sum / n)
      vs.map { case (id, v, _) =>
        val d2 = (0 until dim).map { i =>
          val dev = 1000L * q(v(i)) - mu(i); dev * dev
        }.sum
        (label, id, d2)
      }.sortBy { case (_, id, d2) => (-d2, id) }
        .take(3).zipWithIndex
        .map { case ((l, id, d2), k) => (l, (k + 1).toLong, id, d2) }
    }.sortBy(r => (r._1, r._2))
  }

  test("q157 equals the plain-Scala integer pipeline on 5 random corpora") {
    val rnd = new scala.util.Random(23)
    (0 until 5).foreach { t =>
      val rows = (0 until 60).map { k =>
        val v = Array.fill(8)((rnd.nextFloat() - 0.5f) * 1.2f)
        (k.toLong, v, k % 3)
      }
      val got = q157.run(spark, stage(rows)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == brute(rows), s"trial $t:\n got $got\n exp ${brute(rows)}")
    }
  }

  test("a planted far vector is rank 1 for its label; ties break by vec_id") {
    val base = (0 until 20).map(k => (k.toLong, Array.fill(8)(0.01f), 0))
    val far = (100L, Array.fill(8)(0.4f), 0)
    val got = q157.run(spark, stage(base :+ far)).collect()
    assert(got.head.getLong(2) == 100L, s"planted outlier not rank 1: ${got.toSeq}")
    // the 20 identical base vectors tie at the same d2; ranks 2 and 3
    // must be the LOWEST vec_ids among the tied set
    assert(got(1).getLong(2) == 0L && got(2).getLong(2) == 1L,
      s"tie-break by vec_id violated: ${got.toSeq}")
  }
}
