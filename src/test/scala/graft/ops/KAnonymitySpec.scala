package graft.ops

import graft.SparkSpec

/** Gate for q190's k-anonymity / l-diversity census: the (k, l) cell
  * census and at-risk flags must match a Scala brute force on a hand
  * fixture exercising singleton classes, homogeneous (l = 1) classes,
  * and safe classes; the fixture run must satisfy the record-mass
  * partition law. */
class KAnonymitySpec extends SparkSpec {

  private val q190 = graft.SparkEntry.all.find(_.name == "q190_k_anonymity").get

  test("matches the brute-force census on a hand release table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    // (nation, segment) classes: a singleton (k=1), a homogeneous
    // pair (k=2, l=1), a diverse pair (k=2, l=2), a safe class
    // (k=6, l=2)
    val rows = Seq(
      (1L, "n1", 1, -5.0, "A"),
      (2L, "n2", 1, 10.0, "B"), (3L, "n3", 1, 20.0, "B"),
      (4L, "n4", 2, -1.0, "A"), (5L, "n5", 2, 1.0, "A")) ++
      (6L to 11L).map(i => (i, s"n$i", 3, if (i % 2 == 0) -2.0 else 2.0, "C"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val expect = rows.groupBy(r => (r._3, r._5)).values.map { cls =>
      (cls.size.toLong, cls.map(_._4 < 0).distinct.size.toLong)
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((k, l), n) => (k, l, n, k * n, k < 5 || l < 2) }
      .sortBy(t => (t._1, t._2))
    val out = q190.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == expect, s"got ${out.toSeq}\nexpected $expect")
  }

  test("fixture: record mass partitions the table, flags follow the thresholds") {
    val dir = "/root/testdata/sf0.001"
    val out = q190.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    val n = graft.core.T.df(spark, dir, "customer").count()
    assert(out.map(_._4).sum == n)
    out.foreach { case (k, l, nc, m, risk) =>
      assert(m == k * nc)
      assert(risk == (k < 5 || l < 2))
    }
  }
}
