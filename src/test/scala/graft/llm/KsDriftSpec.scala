package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q158: the windowed integer-ECDF pipeline must
  * report EXACTLY the brute-force two-sided KS statistic. The split
  * assignment is the deterministic q112 hash, so the spec can compute
  * every doc's split (and the exact D for every pair) independently in
  * plain Scala and compare whole output frames. */
class KsDriftSpec extends SparkSpec {

  private val q158 = graft.SparkEntry.all.find(_.name == "q158_ks_split_drift").get

  private def splitOf(docId: Long): String = {
    val h = ((docId % 1000000007L) * 2654435761L) % 1000
    if (h < 800) "train" else if (h < 900) "val" else "test"
  }

  private def stage(rows: Seq[(Long, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    rows.map { case (id, nTok) => (id, Seq.fill(nTok)("w").mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Brute-force exact KS: d_num = max over pooled support of
    * |ca*nb - cb*na| (same integer scaling as the query). */
  private def brute(rows: Seq[(Long, Int)], a: String, b: String): (Long, Long, Long, Long) = {
    val va = rows.filter(r => splitOf(r._1) == a).map(_._2.toLong).sorted
    val vb = rows.filter(r => splitOf(r._1) == b).map(_._2.toLong).sorted
    val (na, nb) = (va.size.toLong, vb.size.toLong)
    val support = (va ++ vb).distinct.sorted
    val dNum = support.map { x =>
      val ca = va.count(_ <= x).toLong
      val cb = vb.count(_ <= x).toLong
      math.abs(ca * nb - cb * na)
    }.max
    (na, nb, dNum, 1000L * dNum / (na * nb))
  }

  test("q158 equals the brute-force KS statistic on 10 random corpora") {
    val rnd = new scala.util.Random(7)
    (0 until 10).foreach { t =>
      // doc_ids spread so every split is populated; skewed lengths in
      // one split half the time so D is usually far from 0
      val rows = (0 until 120).map { k =>
        val id = (t * 1000 + k).toLong
        val skew = if (splitOf(id) == "test" && t % 2 == 0) 30 else 0
        (id, 5 + rnd.nextInt(40) + skew)
      }
      val out = q158.run(spark, stage(rows))
        .select("sa", "sb", "na", "nb", "d_num", "d_milli")
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      graft.llm.TextMining.release(spark)
      assert(out.keySet == Set(("train", "val"), ("train", "test"), ("val", "test")))
      out.foreach { case ((a, b), got) =>
        assert(got == brute(rows, a, b), s"trial $t pair ($a,$b): got $got")
      }
    }
  }

  test("identical distributions report D = 0; disjoint supports report D = n_a*n_b") {
    // same length everywhere -> every ECDF step matches -> D = 0
    val same = (0 until 90).map(k => (k.toLong, 10))
    val r0 = q158.run(spark, stage(same)).select("d_num").collect().map(_.getLong(0))
    graft.llm.TextMining.release(spark)
    assert(r0.forall(_ == 0L), s"equal distributions must give D=0, got ${r0.toSeq}")
    // train docs all shorter than every val/test doc -> at the boundary
    // ca = na, cb = 0 -> d_num = na*nb (the KS maximum), d_milli = 1000
    val split2 = (0 until 90).map { k =>
      val id = k.toLong
      (id, if (splitOf(id) == "train") 5 else 50)
    }
    val r1 = q158.run(spark, stage(split2))
      .filter(col("sa") === "train" && col("sb") =!= "train")
      .select("na", "nb", "d_num", "d_milli").collect()
    graft.llm.TextMining.release(spark)
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1) && r.getLong(3) == 1000L,
        s"disjoint supports must saturate D, got $r")
    }
  }
}
