package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property for [[KeyedTopK.prune]]: on arbitrary random
  * frames (skewed key distributions, k larger/smaller than strata,
  * negative and duplicate-valued ord columns disambiguated by id,
  * 1–13 partitions) the prune composed with the rank window is
  * row-identical to the window alone — the exactness law every
  * consumer (q68, q101, q105) leans on. (scalatestplus isn't on the
  * offline classpath; properties run through scalacheck's own Test
  * runner. Few cases, each a real Spark job.) */
class KeyedTopKProps extends SparkSpec {

  test("prune + window == window alone on random frames") {
    import spark.implicits._
    val genFrame = for {
      n <- Gen.choose(0, 120)
      nKeys <- Gen.choose(1, 6)
      nParts <- Gen.choose(1, 13)
      k <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, nKeys - 1)
        v <- Gen.choose(-50L, 50L)
      } yield (key.toString, v))
    } yield (rows, nParts, k)
    val prop = Prop.forAll(genFrame) { case (rows, nParts, k) =>
      // id disambiguates duplicate v's: ord (v, id) is a total order
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(nParts)
      val windowed = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))))
        .filter(col("rk") <= k)
      val pruned = KeyedTopK.prune(df, Seq("g"), Seq("v" -> true, "id" -> true), k)
        .withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))))
        .filter(col("rk") <= k)
      windowed.collect().map(_.toSeq).toSet == pruned.collect().map(_.toSeq).toSet
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.toString)
  }
}
