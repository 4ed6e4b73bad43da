package graft.ops

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  test("q85: SCD2 intervals tile each user's history — contiguous, non-overlapping, type-alternating") {
    val rows = graft.SparkEntry.queries("q85_scd2_intervals")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("valid_from_us"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $u: interval gap/overlap at ${b.getAs[Long]("valid_from_us")}")
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: adjacent runs share a type — run collapse lost")
        case _ => ()
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")),
        s"user $u: open-ended current run must have NULL valid_to")
    }
  }

  test("q94: NULL values never win top_event and lose bottom_event ties deterministically") {
    // ADVICE r8: the struct ordering key's k field was NULL for NULL
    // values, and Spark/DuckDB order NULL struct fields differently
    // (nulls-first vs nulls-last) — the key now coalesces k to a
    // sentinel below every real key. Pin the production query on a
    // staged events table that actually contains NULLs (the fixtures
    // don't): NULL rows must never beat a real value for top_event,
    // must beat every real value for bottom_event, and an all-NULL
    // group must resolve by the id tiebreak (max id for top, min id
    // for bottom — k is constant across its rows).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q94").toString
    Seq[(Long, Long, String, Option[Double], java.sql.Timestamp)](
      (1L, 10L, "click", Some(5.0), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 10L, "click", None, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (3L, 10L, "click", Some(1.0), java.sql.Timestamp.valueOf("2024-01-01 00:00:02")),
      (5L, 20L, "click", None, java.sql.Timestamp.valueOf("2024-01-01 00:00:03")),
      (4L, 20L, "click", None, java.sql.Timestamp.valueOf("2024-01-01 00:00:04")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.SparkEntry.queries("q94_argmax_agg")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("top_event"), r.getAs[Long]("bottom_event"))).toMap
    assert(rows(10L) == (1L, 2L),
      s"user 10: expected top=1 (value 5.0), bottom=2 (the NULL), got ${rows(10L)}")
    assert(rows(20L) == (5L, 4L),
      s"user 20 (all NULL): id tiebreak gives top=max id, bottom=min id, got ${rows(20L)}")
  }

  test("q60: approx_count_distinct within 5% of exact per group") {
    val rows = graft.SparkEntry.queries("q60_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"${r.getString(0)}: HLL estimate drifted past 5% of exact=${r.getAs[Long]("exact_cust")}")
    }
  }
}
