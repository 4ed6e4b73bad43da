package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Fixture-table access + shared helpers.
  *
  * Oracle determinism rules used across all queries (the driver
  * hash-compares our parquet output against DuckDB running the oracle
  * SQL on the same tables):
  *  - doubles that are *computed* (sums/avgs) are first cast to
  *    decimal(12,2) — exact in both engines because every fixture
  *    money/value column has 2-decimal granularity — aggregated
  *    exactly, then cast back to double;
  *  - doubles that are *passed through* unchanged are bit-identical
  *    in both engines and safe;
  *  - every query ends in a total ORDER BY over its key columns;
  *  - aggregate / computed columns are aliased identically on both
  *    sides (the driver matches columns by name).
  */
object T {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def df(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS), which Spark's reader does not support
    * natively (read as raw long nanos and truncate to microseconds — the
    * same nanos->micros truncation DuckDB applies), and plain
    * timestamp[us] WITHOUT UTC adjustment, which Spark reads as
    * TIMESTAMP_NTZ. Normalize both to session-zone TIMESTAMP: every
    * consumer (unix_micros, watermarks, windows) requires it, and with
    * the UTC session zone the NTZ->LTZ cast re-labels the same wall
    * clock DuckDB sees — values identical in both engines. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Register all fixture tables as temp views (for spark.sql entries).
    * Registered once per (session, dir) — re-registering 10 views per
    * query invocation was wasteful (VERDICT r1 #6). */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def views(s: SparkSession, dir: String): Unit =
    if (registered.put(s, dir) != dir)
      names.foreach(n => df(s, dir, n).createOrReplaceTempView(n))

  /** Exact decimal view of a 2-dp double column: identical in Spark & DuckDB. */
  def dec(c: Column): Column = c.cast("decimal(12,2)")
  def dbl(c: Column): Column = c.cast("double")
}

/** One operator query: a Spark plan + (optionally) DuckDB oracle SQL
  * producing identical column names, values and row order. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
