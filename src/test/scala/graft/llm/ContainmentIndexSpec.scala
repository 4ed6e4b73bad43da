package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LlmText.incrementalContainmentPairs]] pins (round 14): the
  * cross-split directed output equals brute force on adversarial
  * fixtures (including the index-side-df-order edge cases: a delta
  * doc whose shingles are UNSEEN by the index, and containment in
  * both directions), and the deployment artifact
  * ([[LlmText.writeContainmentIndex]]) serves a delta probe
  * bucket-aligned with zero index-side exchange — the q89 asymmetry
  * (shuffle ∝ delta, index scans off its buckets) applied to
  * containment posting lists. */
class ContainmentIndexSpec extends SparkSpec {

  private def dshOf(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "sh")
  }

  /** Brute directional cross-split containment ≥ 0.9. */
  private def brute(dsh: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val d = dsh.select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n"))
      .filter(col("n") >= 10)
    d.as("x").join(d.as("y"), col("x.doc_id") =!= col("y.doc_id") &&
        ((col("x.doc_id") % 10 === 0) =!= (col("y.doc_id") % 10 === 0)))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        size(array_intersect(col("x.sh"), col("y.sh"))).cast("long").as("inter"),
        col("x.n").as("size_a"))
      .filter(col("inter") * 10 >= col("size_a") * 9)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  private def run(dsh: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    LlmText.incrementalContainmentPairs(dsh)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("both directions across the split; within-split pairs excluded; brute-equal") {
    // delta 10 ⊂ index 1 (new doc quotes old), index 3 ⊂ delta 20
    // (old doc subsumed by new), index 1 vs index 3 and delta 10 vs
    // delta 20 would match but are within-split and must NOT appear
    val dsh = dshOf(Seq(
      10L -> (1L to 20L),              // delta, contained in 1
      1L -> (1L to 100L),              // index, container
      3L -> (1L to 15L),               // index, contained in 20 (and in 1)
      20L -> ((1L to 15L) ++ (500L to 580L)), // delta, container of 3
      7L -> (900L to 930L)))           // index, unrelated
    val got = run(dsh)
    val want = brute(dsh)
    assert(got == want, s"got=$got\nwant=$want")
    assert(want.exists(p => p._1 == 10L && p._2 == 1L), "delta-in-index pair missing from truth")
    assert(want.exists(p => p._1 == 3L && p._2 == 20L), "index-in-delta pair missing from truth")
    assert(!got.exists(p => p._1 % 10 == p._2 % 10 && p._1 % 10 == 0), "within-delta pair leaked")
  }

  test("delta doc with shingles entirely unseen by the index: no candidates, no crash") {
    val dsh = dshOf(Seq(
      30L -> (1000L to 1019L), // delta, disjoint from index — df 0 everywhere
      1L -> (1L to 100L),
      3L -> (200L to 250L)))
    assert(run(dsh) == brute(dsh))
    assert(run(dsh).isEmpty)
  }

  test("exact 0.9 boundary crosses the split correctly") {
    // delta 40: 20 shingles, 18 shared with index 9 -> c = 0.9 exactly (in)
    // delta 50: 20 shingles, 17 shared with index 9 -> 0.85 (out)
    val dsh = dshOf(Seq(
      40L -> ((1L to 18L) ++ Seq(701L, 702L)),
      50L -> ((1L to 17L) ++ Seq(801L, 802L, 803L)),
      9L -> (1L to 60L)))
    val got = run(dsh)
    assert(got == brute(dsh))
    assert(got.exists(p => p._1 == 40L && p._2 == 9L && p._3 == 18L))
    assert(!got.exists(p => p._1 == 50L))
  }

  test("fixture corpus: incremental output equals brute cross-split containment") {
    val dsh = LlmText.docShingles(spark, "/root/testdata/sf0.001")
    try assert(run(dsh) == brute(dsh))
    finally LlmText.release(spark)
  }

  test("delta probe of the bucketed posting index: no index-side exchange") {
    val dir = "/root/testdata/sf0.001"
    LlmText.writeContainmentIndex(spark, dir, "containment_index_test", buckets = 4)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = spark.table("containment_index_test")
      // the front-door probe: a delta doc's prefix shingles against
      // the full posting lists (direction 1), and its own postings
      // against the index's in_prefix subset (direction 2) — both
      // join the bucketed table on its bucket key
      // the arriving batch lands on disk before probing (as at a real
      // front door) — the measured plan is then the PROBE's, not the
      // delta's own shingle build
      val landed = java.nio.file.Files
        .createTempDirectory("graft_delta_post").toString
      LlmText.docShingles(spark, dir)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("delta_id"), explode(col("sh")).as("s"))
        .write.mode("overwrite").parquet(landed)
      val deltaPost = spark.read.parquet(landed)
      val probe1 = deltaPost.join(idx, "s")
      val probe2 = deltaPost.join(idx.filter(col("in_prefix")), "s")
      for ((probe, tag) <- Seq((probe1, "full"), (probe2, "prefix"))) {
        val plan = probe.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"), s"$tag: index scan not bucket-aligned:\n$plan")
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges <= 1, s"$tag: index side shuffles ($exchanges):\n$plan")
      }
      assert(probe1.count() > 0, "probe found no candidates at all")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS containment_index_test")
      LlmText.release(spark)
    }
  }
}
