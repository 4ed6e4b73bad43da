package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for the [[MinHashSigs]] kernel: the compiled
  * 64-seed signature must equal the relational HOF formulation it
  * replaced in q166 (same hash family as [[MinHashBands]]) on random
  * shingle arrays AND on the fixture's real shingle frame, and the
  * kernel's per-band 4-tuples must be consistent with the packed
  * [[MinHashBands]] keys (equal tuples → equal keys). */
class MinhashSigsKernelSpec extends SparkSpec {

  import graft.llm.TextHash.{ABase, M}

  private val hofSig =
    s"""transform(sequence(cast(1 as bigint), cast(64 as bigint)), s ->
       |  array_min(transform(sh, h -> (h * (($ABase * s) % $M) + 7919 * s) % $M)))"""
      .stripMargin

  test("kernel equals the HOF formulation on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % M))
    }
    val df = rows.toDF("id", "sh")
      .select(col("id"), TextKernels.minhashSigs(col("sh")).as("k"),
        expr(hofSig).as("h"))
    assert(df.filter(col("k") =!= col("h")).count() == 0)
    // and equal 4-tuples imply equal packed band keys (the q41 index
    // and the q166 calibration must agree on what "a band matches" is)
    val bands = rows.toDF("id", "sh")
      .select(col("id"), TextKernels.minhashSigs(col("sh")).as("sig"),
        TextKernels.minhashBands(col("sh")).as("bk"))
      .collect()
    bands.foreach { r =>
      val sig = r.getSeq[Long](1); val bk = r.getSeq[Long](2)
      (0 until 16).foreach { b =>
        val packed = ((sig(4 * b) * 31 + sig(4 * b + 1)) % TextKernels.M * 31
          + sig(4 * b + 2)) % TextKernels.M * 31 + sig(4 * b + 3)
        assert(bk(b) == packed % TextKernels.M)
      }
    }
  }

  test("kernel equals the HOF on the fixture shingle frame") {
    val sh = graft.llm.LlmText.docShingles(spark, "/root/testdata/sf0.001")
    val df = sh.select(TextKernels.minhashSigs(col("sh")).as("k"), expr(hofSig).as("h"))
    assert(df.count() > 0 && df.filter(col("k") =!= col("h")).count() == 0)
    graft.llm.LlmText.release(spark)
  }
}
