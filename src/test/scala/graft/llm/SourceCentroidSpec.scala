package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q161: the join → integer centroid → pair
  * explode pipeline must match a plain-Scala reimplementation of the
  * SAME arithmetic (milli quantization, micro floor-quotient centroid,
  * int64 pairwise distance, sources ordered lexicographically). */
class SourceCentroidSpec extends SparkSpec {

  private val q161 = graft.SparkEntry.all.find(_.name == "q161_source_centroid_dist").get

  private def stage(docs: Seq[(Long, String)],
                    embs: Seq[(Long, Array[Float])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd").toString
    docs.toDF("doc_id", "source")
      .withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(1L))
      .write.parquet(s"$dir/documents.parquet")
    embs.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def brute(docs: Seq[(Long, String)],
                    embs: Seq[(Long, Array[Float])]): Seq[(String, String, Long)] = {
    def q(x: Float): Long =
      BigDecimal(x.toDouble * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val src = docs.toMap
    val bySrc = embs.flatMap { case (id, v) => src.get(id).map(s => (s, v)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cent = bySrc.map { case (s, vs) =>
      val dim = vs.head.length
      s -> (0 until dim).map(i => 1000L * vs.map(v => q(v(i))).sum / vs.size)
    }
    val ss = cent.keys.toSeq.sorted
    for { i <- ss.indices; j <- (i + 1) until ss.size } yield
      (ss(i), ss(j),
        cent(ss(i)).zip(cent(ss(j))).map { case (a, b) => (a - b) * (a - b) }.sum)
  }

  test("q161 equals the plain-Scala integer pipeline on 5 random corpora") {
    val rnd = new scala.util.Random(41)
    (0 until 5).foreach { t =>
      val docs = (0 until 50).map(k => (k.toLong, s"s${k % 4}"))
      // only a subset of docs has embeddings (the inner-join contract)
      val embs = (0 until 35).map(k =>
        (k.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 1.1f)))
      val got = q161.run(spark, stage(docs, embs)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == brute(docs, embs), s"trial $t:\n got $got\n exp ${brute(docs, embs)}")
    }
  }

  test("identical per-source distributions give distance 0; a shifted source does not") {
    val docs = (0 until 30).map(k => (k.toLong, s"s${k % 3}"))
    val base = Array.fill(8)(0.25f)
    val embs = (0 until 30).map { k =>
      (k.toLong, if (k % 3 == 2) base.map(_ + 0.3f) else base.clone())
    }
    val got = q161.run(spark, stage(docs, embs)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got(("s0", "s1")) == 0L, s"identical sources must be at distance 0: $got")
    assert(got(("s0", "s2")) > 0L && got(("s1", "s2")) > 0L,
      s"the shifted source must be strictly apart: $got")
  }
}
