package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[KeyedTopK.prune]] + the original rank window must be
  * row-identical to the window alone, for every supported ord type,
  * direction, and key arity; the contract violations (ord collision,
  * null ord, unsupported type) must throw, not silently mis-prune. */
class KeyedTopKSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("g", "id", "v", "d").repartition(7)
  }

  private val frame = df((0L until 2000L).map(i =>
    (s"g${i % 3}", i, (i * 48271) % 65537, ((i * 31) % 997) / 100.0)))

  private def viaWindow(base: org.apache.spark.sql.DataFrame,
      keys: Seq[String], ord: Seq[org.apache.spark.sql.Column], k: Int) =
    base.withColumn("rk", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)))
      .filter(col("rk") <= k)

  private def sets(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).toSet

  test("asc long ord ≡ plain window") {
    val pruned = KeyedTopK.prune(frame, Seq("g"), Seq("v" -> true, "id" -> true), 4)
    assert(sets(viaWindow(pruned, Seq("g"), Seq(col("v"), col("id")), 4)) ==
      sets(viaWindow(frame, Seq("g"), Seq(col("v"), col("id")), 4)))
  }

  test("desc double ord ≡ plain window") {
    val ord = Seq(col("d").desc, col("id"))
    val pruned = KeyedTopK.prune(frame, Seq("g"), Seq("d" -> false, "id" -> true), 6)
    assert(sets(viaWindow(pruned, Seq("g"), ord, 6)) ==
      sets(viaWindow(frame, Seq("g"), ord, 6)))
  }

  test("two-column key, string ord ≡ plain window") {
    val base = frame.withColumn("g2", (col("id") % 2).cast("string"))
      .withColumn("s", concat(lit("k"), format_string("%05d", col("v"))))
    val ord = Seq(col("s"), col("id"))
    val pruned = KeyedTopK.prune(base, Seq("g", "g2"),
      Seq("s" -> true, "id" -> true), 3)
    assert(sets(viaWindow(pruned, Seq("g", "g2"), ord, 3)) ==
      sets(viaWindow(base, Seq("g", "g2"), ord, 3)))
  }

  test("strata smaller than k pass through whole") {
    val tiny = df(Seq(("a", 1L, 5L, 0.0), ("a", 2L, 3L, 0.0), ("b", 3L, 9L, 0.0)))
    val pruned = KeyedTopK.prune(tiny, Seq("g"), Seq("v" -> true, "id" -> true), 10)
    assert(pruned.count() == 3)
  }

  test("ord collision among retained rows throws") {
    val dup = df(Seq(("a", 1L, 7L, 0.0), ("a", 1L, 7L, 0.0))).coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      KeyedTopK.prune(dup, Seq("g"), Seq("v" -> true, "id" -> true), 5).count()
    }
    assert(e.getMessage.contains("collision") ||
      Option(e.getCause).exists(_.getMessage.contains("collision")))
  }

  test("null ord value throws") {
    val withNull = frame.withColumn("v",
      when(col("id") === 17L, lit(null)).otherwise(col("v")))
    val e = intercept[org.apache.spark.SparkException] {
      KeyedTopK.prune(withNull, Seq("g"), Seq("v" -> true, "id" -> true), 5).count()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("unsupported ord type throws eagerly") {
    val arr = frame.withColumn("a", array(col("v")))
    intercept[IllegalArgumentException] {
      KeyedTopK.prune(arr, Seq("g"), Seq("a" -> true), 5)
    }
  }
}
