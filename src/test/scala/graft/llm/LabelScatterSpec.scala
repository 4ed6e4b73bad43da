package graft.llm

import graft.SparkSpec

/** Gate for q209's pair-free label scatter: every label row must match
  * a BigInt brute force that ENUMERATES the pairs the operator's
  * algebraic identity avoids (the whole point of the spec: the
  * identity ‖Σq‖² − Σ‖q‖² equals the explicit Σ_{i≠j} q_i·q_j);
  * engineered endpoints — n identical vectors read compact_milli
  * exactly 1000, an antipodal pair reads a NEGATIVE mean dot
  * (truncation toward zero pinned), singletons NULL. */
class LabelScatterSpec extends SparkSpec {

  private val q209 = graft.SparkEntry.all.find(_.name == "q209_label_scatter").get

  private def brute(rows: Seq[(Long, Seq[Float], Int)]): Seq[(Int, Long, Long, Option[Long], Option[Long])] =
    rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (label, vs) =>
      val qs = vs.map(_._2.map(v => BigInt(math.round(v.toDouble * 1000))))
      val n = qs.size.toLong
      val energy = qs.map(q => q.map(x => x * x).sum).sum
      // the EXPLICIT pair sum the operator must equal without enumerating
      val pairSum = (for {
        i <- qs.indices; j <- qs.indices if i != j
      } yield qs(i).zip(qs(j)).map { case (a, b) => a * b }.sum).sum
      val meanDot = if (n < 2) None
        else Some((pairSum / (n * (n - 1))).toLong)
      val compact = if (n < 2 || energy == 0) None
        else Some((BigInt(1000) * pairSum / ((n - 1) * energy)).toLong)
      (label, n, energy.toLong, meanDot, compact)
    }

  private def run(rows: Seq[(Long, Seq[Float], Int)]): Seq[(Int, Long, Long, Option[Long], Option[Long])] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scatter").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    q209.run(spark, dir).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
  }

  test("matches the enumerated pair sum; endpoints pinned") {
    val rows = Seq(
      // label 0: three identical vectors -> compact exactly 1000
      (1L, Seq(0.6f, 0.8f, 0.0f), 0),
      (2L, Seq(0.6f, 0.8f, 0.0f), 0),
      (3L, Seq(0.6f, 0.8f, 0.0f), 0),
      // label 1: antipodal pair -> negative mean dot (trunc toward zero)
      (4L, Seq(1.0f, 0.0f, 0.0f), 1),
      (5L, Seq(-1.0f, 0.001f, 0.0f), 1),
      // label 2: singleton -> NULLs
      (6L, Seq(0.3f, 0.3f, 0.3f), 2),
      // label 3: mixed
      (7L, Seq(0.5f, 0.5f, 0.1f), 3),
      (8L, Seq(0.4f, -0.6f, 0.2f), 3),
      (9L, Seq(0.0f, 0.9f, -0.3f), 3))
    val (got, want) = (run(rows), brute(rows))
    assert(got == want, s"got $got\nexpected $want")
    val m = got.map(r => r._1 -> r).toMap
    assert(m(0)._5.contains(1000L))
    assert(m(1)._4.exists(_ < 0))
    assert(m(2)._4.isEmpty && m(2)._5.isEmpty)
  }

  test("fixture: identity against the enumerated brute force end to end") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.core.T.df(spark, dir, "embeddings").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val (got, want) = (q209.run(spark, dir).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq, brute(rows))
    assert(got == want, s"got $got\nexpected $want")
  }
}
