package graft.llm

import graft.SparkSpec

/** Gate for q188's semantic-cluster occupancy census: cluster sizes
  * must match a Scala brute force of the q83 assignment (first-8
  * unit-norm pivots, cosine argmax, ties to the smaller pivot id) on
  * a hand fixture, and the census arithmetic (triangle pairs,
  * sub-block counts, milli shares) must satisfy its laws on the
  * fixture corpus. */
class SemClusterCensusSpec extends SparkSpec {

  private val q188 = graft.SparkEntry.all.find(_.name == "q188_sem_cluster_census").get

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  test("cluster sizes match the brute-force first-8-pivot assignment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semcensus").toString
    // 20 deterministic 4-d vectors, ids 0..19 (q83's pivot contract
    // needs ids 0..7 present); MINSTD-ish values, no degenerate ties
    def vec(id: Long): Array[Float] =
      Array.tabulate(4)(d => (((id * 48271 + d * 16807 + 11) % 997) - 498).toFloat / 100f)
    val rows = (0L until 20L).map(id => (id, vec(id), s"l${id % 3}"))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val pivots = rows.take(8).map(r => unit(r._2.map(_.toDouble)))
    val expect = rows.map { case (id, v, _) =>
      val dots = pivots.map(p => p.zip(v.map(_.toDouble)).map { case (a, b) => a * b }.sum)
      dots.zipWithIndex.maxBy { case (d, j) => (d, -j) }._2.toLong
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = q188.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expect, s"got $out\nexpected $expect")
  }

  test("fixture: sizes partition the corpus and the census laws hold") {
    val dir = "/root/testdata/sf0.001"
    val out = q188.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val n = graft.core.T.df(spark, dir, "embeddings").count()
    assert(out.map(_._2).sum == n)
    val cap = LlmVector.SemSubCap.toLong
    out.foreach { case (_, cs, tri, nsub, bt, _) =>
      assert(tri == cs * (cs - 1) / 2)
      assert(nsub == (cs + cap - 1) / cap)
      assert(bt == nsub * (nsub + 1) / 2)
    }
    // milli shares of the total triangle mass sum to ~1000 (truncation)
    val shares = out.map(_._6).sum
    assert(shares <= 1000 && shares > 1000 - out.length)
  }
}
