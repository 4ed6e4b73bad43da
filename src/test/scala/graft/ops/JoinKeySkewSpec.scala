package graft.ops

import graft.SparkSpec

/** Gate for q186's join-key skew census: the frequency histogram,
  * per-class mass, and hottest-first cumulative milli share must match
  * a BigInt brute force on a hand-skewed key column, and the fixture
  * run must satisfy the census laws (mass partition, monotone
  * cumulative reaching exactly 1000 at the coldest class). */
class JoinKeySkewSpec extends SparkSpec {

  private val q186 = graft.SparkEntry.all.find(_.name == "q186_join_key_skew").get

  private def brute(keys: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val freq = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hist = freq.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.map { case (f, n) => (f, n, f * n) }
    val total = BigInt(hist.map(_._3).sum)
    // cumulative from the hottest class down, reported ascending
    val desc = hist.sortBy(-_._1)
    val cums = desc.scanLeft(BigInt(0))((acc, h) => acc + BigInt(h._3)).tail
    desc.zip(cums).map { case ((f, n, m), c) =>
      (f, n, m, (BigInt(1000) * c / total).toLong)
    }.sortBy(_._1)
  }

  test("matches the BigInt brute force on a hand-skewed key column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skewcensus").toString
    // one mega-key (40 rows), two warm keys (7 each), a cold tail of
    // singletons and pairs — every census row class exercised
    val keys: Seq[Long] =
      Seq.fill(40)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(7)(3L) ++
        Seq.fill(2)(4L) ++ Seq.fill(2)(5L) ++ (10L to 19L)
    keys.toDF("l_orderkey").write.parquet(s"$dir/lineitem.parquet")
    val out = q186.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == brute(keys), s"got ${out.toSeq}\nexpected ${brute(keys)}")
  }

  test("fixture: mass partitions the table and the cold edge closes at 1000") {
    val dir = "/root/testdata/sf0.001"
    val out = q186.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // Σ mass = |lineitem| (frequency classes partition the rows)
    val n = graft.core.T.df(spark, dir, "lineitem").count()
    assert(out.map(_._3).sum == n)
    // mass = freq · n_keys per class
    out.foreach { case (f, k, m, _) => assert(m == f * k) }
    // cumulative hot share decreases with ascending frequency read
    // order reversed — i.e. it is monotone nondecreasing hot-first —
    // and the coldest class (first row ascending) carries ALL mass
    assert(out.head._4 == 1000L)
    val hotFirst = out.reverse.map(_._4)
    assert(hotFirst.zip(hotFirst.tail).forall { case (a, b) => a <= b })
  }
}
