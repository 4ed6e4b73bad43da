package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for q154's exact-extent claim: the diagonal
  * gaps-and-islands arithmetic must report EXACTLY the planted longest
  * shared token run — winnowing candidates only guarantee detection;
  * this operator's whole value is the exact number. */
class OverlapVerifySpec extends SparkSpec {

  private val q154 = graft.SparkEntry.all.find(_.name == "q154_overlap_verify").get

  private def stage(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("overlap").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private val rnd = new scala.util.Random(11)
  private def noise(tag: String, n: Int): String =
    (0 until n).map(k => s"${tag}_${k}_${rnd.nextInt(1000)}").mkString(" ")

  test("the longest planted run is reported EXACTLY, over 30 random trials") {
    (0 until 30).foreach { t =>
      val len = 6 + rnd.nextInt(25)
      val run = (0 until len).map(j => s"r${t}_$j").mkString(" ")
      // a second, SHORTER shared run must not inflate the answer
      val decoy = (0 until 6).map(j => s"d${t}_$j").mkString(" ")
      val a = s"${noise(s"a$t", 8)} $run ${noise(s"a$t'", 8)} $decoy"
      val b = s"$decoy ${noise(s"b$t", 8)} $run ${noise(s"b$t'", 8)}"
      val out = q154.run(spark, stage(Seq((1L, a), (2L, b)))).collect()
      assert(out.length == 1, s"trial $t: expected the one candidate pair")
      val r = out.head
      assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
      assert(r.getLong(3) == len.toLong,
        s"trial $t: planted $len, reported ${r.getLong(3)}")
    }
  }

  test("a repeated-token run (internal self-similarity) still measures its true length") {
    // all-identical tokens create many diagonals; the max island must
    // still be the full run, not a partial alignment
    val run = Seq.fill(10)("x").mkString(" ")
    val a = s"${noise("a", 8)} $run ${noise("a'", 8)}"
    val b = s"${noise("b", 8)} $run ${noise("b'", 8)}"
    val out = q154.run(spark, stage(Seq((1L, a), (2L, b)))).collect()
    assert(out.length == 1 && out.head.getLong(3) == 10L,
      s"got ${out.mkString(",")}")
  }

  test("near-identical docs report the shared prefix/suffix structure, not overcount") {
    // b = a with ONE token substituted at position 20 of 41: the
    // longest shared run is max(20, 20) = 20 tokens on each side
    val toks = (0 until 41).map(j => s"w$j")
    val a = toks.mkString(" ")
    val b = toks.updated(20, "SUBST").mkString(" ")
    val out = q154.run(spark, stage(Seq((1L, a), (2L, b)))).collect()
    assert(out.length == 1 && out.head.getLong(3) == 20L,
      s"got ${out.mkString(",")}")
  }
}
