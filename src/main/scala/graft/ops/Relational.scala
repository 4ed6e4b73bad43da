package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, T}

/** General relational operator surface (SURVEY.md §2.3, §2.4 A9/A10,
  * §2.5, §2.6, §2.7): joins of every type, aggregations, windows, set
  * operations, sorts/limits, subqueries. All are declarative
  * DataFrame/Catalyst plans — predicate pushdown, column pruning, join
  * strategy selection (broadcast for the small dims), and AQE come from
  * the optimizer, not hand-scheduling. */
object Relational {

  /** Shared-dialect SQL (runs verbatim on Spark and DuckDB). */
  private def shared(name: String, sql: String): Q =
    Q(name, sql) { (s, dir) => T.views(s, dir); s.sql(sql) }

  val qs: Seq[Q] = Seq(

    // ---- A9/A10: hash aggregation w/ partial (map-side) combine. TPC-H Q1 shape.
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_base_price,
        |  cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1.0 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS sum_disc_price,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE cast(l_shipdate as date) <= date '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      T.df(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-01").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          T.dbl(sum(T.dec(col("l_quantity")))).as("sum_qty"),
          T.dbl(sum(T.dec(col("l_extendedprice")))).as("sum_base_price"),
          T.dbl(sum(T.dec(col("l_extendedprice")) *
            (lit(1.0).cast("decimal(12,2)") - T.dec(col("l_discount"))))).as("sum_disc_price"),
          (T.dbl(sum(T.dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- P5/P6: filter + projection; both reach the parquet scan (pushdown + pruning).
    Q("q2_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE cast(l_shipdate as date) >= date '2001-06-01' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      T.df(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("2001-06-01").cast("date") &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- J3: multi-way inner equi-join (orders-customer-nation-region).
    // nation/region are broadcast by Catalyst (small dims); one shuffle on o_custkey.
    Q("q3_join_inner_multi",
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1996
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val o = T.df(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      val c = T.df(s, dir, "customer")
      val n = T.df(s, dir, "nation")
      val r = T.df(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          T.dbl(sum(T.dec(col("o_totalprice")))).as("revenue"))
        .orderBy("r_name", "n_name")
    },

    // ---- J3: left outer join + grouped aggregate with null-safe totals.
    // Scale-safe shape (VERDICT r1 #4): pre-aggregate the fact side to
    // customer cardinality FIRST, then join — the shuffle carries the
    // (small) aggregate, not the full joined fact set.
    Q("q4_join_left",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  cast(coalesce(sum(cast(o_totalprice as decimal(12,2))), 0) as double) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T.df(s, dir, "customer")
      val oAgg = T.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("n_o"), sum(T.dec(col("o_totalprice"))).as("sp"))
      c.join(oAgg, c("c_custkey") === oAgg("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_o"), lit(0L)).as("n_orders"),
          T.dbl(coalesce(col("sp"), lit(0).cast("decimal(12,2)"))).as("spend"))
        .orderBy("c_custkey")
    },

    // ---- J1/T1: semi-join chain (the reference's set-intersection search,
    // toexcel.py:109-115, as left_semi joins — no driver-side sets).
    Q("q5_join_semi_chain",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderstatus = 'F'
        |    AND EXISTS (SELECT 1 FROM lineitem l
        |                WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'))
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T.df(s, dir, "customer")
      val o = T.df(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val l = T.df(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val oWithR = o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      c.join(oWithR, c("c_custkey") === oWithR("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- J3: anti join (NOT EXISTS).
    Q("q6_join_anti",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T.df(s, dir, "customer")
      val o = T.df(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // ---- J3: full outer join of two grouped aggregates.
    // Final date key emitted as varchar on both sides: engines stringify
    // DATE differently downstream, equal values must hash identically.
    Q("q7_join_full",
      """SELECT cast(coalesce(a.day, b.day) as varchar) AS day,
        |  coalesce(a.n_signup, 0) AS n_signup, coalesce(b.n_error, 0) AS n_error
        |FROM (SELECT cast(ts as date) AS day, count(*) AS n_signup FROM events
        |      WHERE event_type = 'signup' GROUP BY 1) a
        |FULL JOIN (SELECT cast(ts as date) AS day, count(*) AS n_error FROM events
        |           WHERE event_type = 'error' GROUP BY 1) b
        |ON a.day = b.day
        |ORDER BY day""".stripMargin) { (s, dir) =>
      val ev = T.df(s, dir, "events").withColumn("day", col("ts").cast("date"))
      val a = ev.filter(col("event_type") === "signup").groupBy("day")
        .agg(count(lit(1)).as("n_signup"))
      val b = ev.filter(col("event_type") === "error").groupBy("day")
        .agg(count(lit(1)).as("n_error"))
      a.join(b, Seq("day"), "full")
        .select(col("day").cast("string").as("day"),
          coalesce(col("n_signup"), lit(0)).as("n_signup"),
          coalesce(col("n_error"), lit(0)).as("n_error"))
        .orderBy("day")
    },

    // ---- J3: cross join (tiny dims only; BroadcastNestedLoop).
    Q("q8_join_cross",
      """SELECT a.r_name AS r1_name, b.r_name AS r2_name
        |FROM region a CROSS JOIN region b
        |ORDER BY r1_name, r2_name""".stripMargin) { (s, dir) =>
      val a = T.df(s, dir, "region").select(col("r_name").as("r1_name"))
      val b = T.df(s, dir, "region").select(col("r_name").as("r2_name"))
      a.crossJoin(b).orderBy("r1_name", "r2_name")
    },

    // ---- J4: equi + range (theta) join: lineitem quantity within part size band.
    Q("q9_join_range",
      """SELECT p_brand, count(*) AS n
        |FROM part JOIN lineitem
        |  ON l_partkey = p_partkey AND l_quantity BETWEEN p_size - 2 AND p_size + 2
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val p = T.df(s, dir, "part")
      val l = T.df(s, dir, "lineitem")
      p.join(l, l("l_partkey") === p("p_partkey") &&
          l("l_quantity").between(p("p_size") - 2, p("p_size") + 2))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // ---- §2.6: top-k — Spark plans TakeOrderedAndProject (no full sort).
    Q("q10_sort_limit_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    },

    // ---- §2.5: ranking window functions (top-3 per group).
    // NOTE (VERDICT r1 #5): c_nationkey has 25 distinct values — fine as
    // a rank-function correctness probe, but a 25-way partition caps
    // window parallelism; at scale partition by a high-cardinality key
    // (see q12, per-user windows) or pre-bucket the input.
    Q("q11_window_rank",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER w1 AS rn,
        |    rank() OVER w2 AS rk,
        |    dense_rank() OVER w2 AS drk,
        |    lag(c_acctbal, 1) OVER w1 AS prev_bal
        |  FROM customer
        |  WINDOW w1 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
        |         w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC))
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin) { (s, dir) =>
      val w1 = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      val w2 = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
      T.df(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w1).as("rn"),
          rank().over(w2).as("rk"),
          dense_rank().over(w2).as("drk"),
          lag(col("c_acctbal"), 1).over(w1).as("prev_bal"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },

    // ---- §2.5: running aggregates over an explicit ROWS frame + lead/lag/ntile.
    // Windows order by event_id alone (unique per user): ts is nanos in
    // DuckDB but micros in Spark, so a ts tiebreak could diverge on
    // sub-microsecond ties (ADVICE r1, low).
    Q("q12_window_running",
      """SELECT user_id, event_id,
        |  cast(sum(cast(value as decimal(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_value,
        |  count(*) OVER (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
        |  lag(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type,
        |  lead(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY event_id) AS next_type,
        |  ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS quartile
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.df(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          T.dbl(sum(T.dec(col("value"))).over(frame)).as("running_value"),
          count(lit(1)).over(frame).as("running_n"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          ntile(4).over(w).as("quartile"))
        .orderBy("user_id", "event_id")
    },

    // ---- distribution window functions (the remaining §2.5 scalar
    // window fns): percent_rank/cume_dist per partition — per-group
    // quantile normalization, e.g. calibrating quality scores within
    // a source. Values are small-integer ratios computed as one IEEE
    // division from identical inputs in both engines — bit-stable
    // (no summation order involved). Same single user-keyed exchange
    // as every per-user window.
    Q("q92_window_distribution",
      """SELECT user_id, event_id,
        |  percent_rank() OVER (PARTITION BY user_id ORDER BY event_id) AS pr,
        |  cume_dist() OVER (PARTITION BY user_id ORDER BY event_id) AS cd
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      T.df(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("user_id", "event_id")
    },

    // ---- value window functions: first/last/nth over a running
    // frame, plus the IGNORE NULLS variant (the as-of join's inner
    // primitive — q52 builds on exactly this `last(_, ignoreNulls)`
    // trick). The ordering key is unique (event_id), so every value
    // is deterministic; running_last is the row's own value by frame
    // definition and pins the frame semantics cross-engine.
    Q("q95_window_value_fns",
      """SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last,
        |  nth_value(event_type, 2) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_type,
        |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE event_type END
        |             IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nonerr
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.df(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(run).as("running_last"),
          nth_value(col("event_type"), 2).over(run).as("second_type"),
          last(when(col("event_type") === "error", lit(null)).otherwise(col("event_type")),
            ignoreNulls = true).over(run).as("last_nonerr"))
        .orderBy("user_id", "event_id")
    },

    // ---- §2.7: UNION (distinct).
    Q("q13_union",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = T.df(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .union(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    },

    // ---- §2.7: INTERSECT.
    Q("q14_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = T.df(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- §2.7: EXCEPT.
    Q("q15_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T.df(s, dir, "customer").select("c_custkey")
      val o = T.df(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      c.except(o).orderBy("c_custkey")
    },

    // ---- A10: ROLLUP (subtotal levels surfaced as 'ALL' to avoid
    // engine-specific NULL ordering).
    Q("q16_rollup",
      """SELECT coalesce(cast(year(o_orderdate) as varchar), 'ALL') AS yr,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS n,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS spend
        |FROM orders GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
        |ORDER BY yr, prio""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders")
        .withColumn("yr_i", year(col("o_orderdate")))
        .rollup(col("yr_i"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), T.dbl(sum(T.dec(col("o_totalprice")))).as("spend"))
        .select(coalesce(col("yr_i").cast("string"), lit("ALL")).as("yr"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"), col("n"), col("spend"))
        .orderBy("yr", "prio")
    },

    // ---- A10: CUBE.
    Q("q17_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, prio""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"), col("n"))
        .orderBy("st", "prio")
    },

    // ---- A10: GROUPING SETS (shared SQL dialect).
    shared("q18_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY st, prio""".stripMargin),

    // ---- A10: distinct aggregates.
    Q("q19_distinct_agg",
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT year(o_orderdate)) AS n_years,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // ---- A9/A10: HAVING (post-aggregation filter).
    Q("q20_having",
      """SELECT o_custkey, count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), T.dbl(sum(T.dec(col("o_totalprice")))).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")
    },

    // ---- correlated EXISTS subquery (shared SQL).
    shared("q21_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // ---- scalar subquery (shared SQL; exact-decimal mean).
    shared("q22_scalar_subquery",
      """SELECT count(*) AS n_above, min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders
        |WHERE o_totalprice > (SELECT cast(sum(cast(o_totalprice as decimal(12,2))) as double) / count(*)
        |                      FROM orders)""".stripMargin),

    // ---- IN subquery (shared SQL).
    shared("q23_in_subquery",
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000)""".stripMargin)
  )
}
