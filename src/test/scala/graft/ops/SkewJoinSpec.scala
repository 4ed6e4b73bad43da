package graft.ops

import graft.SparkSpec
import graft.core.T
import org.apache.spark.sql.functions._

/** Salting must be invisible in the result and visible in the plan. */
class SkewJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join equals the plain equi-join row-for-row") {
    val plain = T.df(spark, dir, "lineitem")
      .join(T.df(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(
        T.df(spark, dir, "lineitem"), "l_orderkey",
        T.df(spark, dir, "orders"), "o_orderkey", 8)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("the salt participates in the join keys (hot keys split across reducers)") {
    val plan = SkewJoin.saltedJoin(
        T.df(spark, dir, "lineitem"), "l_orderkey",
        T.df(spark, dir, "orders"), "o_orderkey", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from the plan:\n$plan")
  }

  test("a skewed key's probe rows spread across all salts") {
    import spark.implicits._
    // one hot key with 1000 distinct rows, build side of 1 row
    val probe = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val build = Seq((42L, "x")).toDF("bk", "v")
    val salts = probe
      .withColumn("__salt", pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(8)))
      .select(countDistinct("__salt")).head().getLong(0)
    assert(salts == 8L, s"expected the hot key's rows on all 8 salts, got $salts")
    assert(SkewJoin.saltedJoin(probe, "k", build, "bk", 8).count() == 1000)
  }
}
