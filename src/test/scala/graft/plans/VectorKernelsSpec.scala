package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DotProduct kernel must be BIT-identical to the HOF fold it
  * replaced (same left-to-right double accumulation — the ANN ranks
  * and the near-dup thresholds depend on exact equality). */
class VectorKernelsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)

  test("DotProduct kernel bit-identical to the HOF fold on fixture pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val pairs = e.as("a").crossJoin(e.as("b").limit(7))
      .select(col("a.embedding").as("ea"), col("b.embedding").as("eb"))
    val diverging = pairs
      .select(VectorKernels.dot(col("ea"), col("eb")).as("k"),
        hofDot(col("ea"), col("eb")).as("h"))
      .filter(col("k") =!= col("h")) // exact double equality, not approx
      .count()
    assert(diverging == 0, s"$diverging pairs diverge from the HOF fold")
  }

  test("DotLong kernel equals the integer HOF fold on quantized fixture pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .selectExpr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint)) as q")
    val pairs = e.as("a").crossJoin(e.as("b").limit(7))
      .select(col("a.q").as("qa"), col("b.q").as("qb"))
    val diverging = pairs
      .select(VectorKernels.dotq(col("qa"), col("qb")).as("k"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diverging == 0, s"$diverging pairs diverge from the integer HOF fold")
  }

  test("DotLong totality: null arrays, null elements, ragged lengths") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(3L, 4L), 11L),
        |  (array(1L, CAST(NULL AS BIGINT)), array(5L, 7L), 5L),
        |  (array(2L), array(3L, 9L), 6L),
        |  (CAST(NULL AS ARRAY<BIGINT>), array(1L), CAST(NULL AS BIGINT))
        |AS t(a, b, expected)""".stripMargin)
    val bad = df.select(VectorKernels.dotq(col("a"), col("b")).as("d"), col("expected"))
      .filter(!(col("d") <=> col("expected"))).count()
    assert(bad == 0)
  }

  test("totality: null arrays, null elements, ragged lengths") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), CAST(11.0 AS DOUBLE)),
        |  (array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(5.0 AS FLOAT), CAST(7.0 AS FLOAT)), CAST(5.0 AS DOUBLE)),
        |  (array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(9.0 AS FLOAT)), CAST(6.0 AS DOUBLE)),
        |  (CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)), CAST(NULL AS DOUBLE))
        |AS t(a, b, expected)""".stripMargin)
    val bad = df.select(VectorKernels.dot(col("a"), col("b")).as("d"), col("expected"))
      .filter(!(col("d") <=> col("expected"))).count()
    assert(bad == 0)
  }
}
