package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Scalar-function surface (SURVEY.md §2.8): string, regex, date, math,
  * conditional, JSON, array functions and explode. All built-in
  * `org.apache.spark.sql.functions` (codegen'd) — no UDFs.
  *
  * Cross-engine notes baked into the oracles:
  *  - Spark regexp_replace is global; DuckDB needs the 'g' flag;
  *  - Spark dayofweek is 1=Sunday, DuckDB dayofweek is 0=Sunday (+1);
  *  - Spark ceil/floor(double) yield BIGINT, DuckDB yield DOUBLE (cast);
  *  - round() goes through exact decimal, never raw doubles;
  *  - integer division is `div` in Spark, `//` in DuckDB.
  */
object Scalars {

  val qs: Seq[Q] = Seq(

    // ---- F1-F5, F11: string functions.
    Q("q24_string_fns",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 8) AS sub, length(p_name) AS len,
        |  replace(p_type, ' ', '_') AS rep, reverse(p_brand) AS rev,
        |  lpad(cast(p_size as varchar), 4, '0') AS pad,
        |  concat_ws('|', p_brand, p_type) AS cw,
        |  strpos(p_name, 'a') AS inst,
        |  trim(concat(' ', p_name, ' ')) AS tr
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      T.df(s, dir, "part").select(col("p_partkey"),
          upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub"), length(col("p_name")).as("len"),
          regexp_replace(col("p_type"), " ", "_").as("rep"), reverse(col("p_brand")).as("rev"),
          lpad(col("p_size").cast("string"), 4, "0").as("pad"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
          instr(col("p_name"), "a").as("inst"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"))
        .orderBy("p_partkey")
    },

    // ---- P2/F4/F14: regex extraction, global replace, match test, match count.
    Q("q25_regex_fns",
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
        |  regexp_replace(substring(text, 1, 50), '[aeiou]', '*', 'g') AS starred,
        |  cast(regexp_matches(text, 'data') as int) AS has_data
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T.df(s, dir, "documents").select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("n_words"),
          regexp_replace(substring(col("text"), 1, 50), "[aeiou]", "*").as("starred"),
          col("text").rlike("data").cast("int").as("has_data"))
        .orderBy("doc_id")
    },

    // ---- §2.8 date functions (F13 family).
    Q("q26_date_fns",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dy,
        |  quarter(o_orderdate) AS qtr,
        |  dayofweek(cast(o_orderdate as date)) + 1 AS dow,
        |  cast(cast(date_trunc('month', o_orderdate) as date) as varchar) AS mon_start,
        |  date_diff('day', cast(o_orderdate as date), date '2002-01-01') AS days_to_2002,
        |  cast(cast(o_orderdate as date) + 7 as varchar) AS plus7,
        |  cast(last_day(cast(o_orderdate as date)) as varchar) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      T.df(s, dir, "orders").select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate").cast("date")).as("dow"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("mon_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
          date_add(col("o_orderdate").cast("date"), 7).cast("string").as("plus7"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("eom"))
        .orderBy("o_orderkey")
    },

    // ---- §2.8 math functions (exact-decimal round; IEEE-deterministic sqrt).
    Q("q27_math_fns",
      """SELECT c_custkey,
        |  abs(c_acctbal) AS ab,
        |  cast(ceil(c_acctbal) as bigint) AS ce,
        |  cast(floor(c_acctbal) as bigint) AS fl,
        |  cast(round(cast(c_acctbal as decimal(12,2)), 1) as double) AS rnd1,
        |  sqrt(abs(c_acctbal)) AS sq,
        |  c_custkey % 7 AS md,
        |  cast(sign(c_acctbal) as int) AS sg,
        |  cast(power(c_nationkey, 2) as bigint) AS pw
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      T.df(s, dir, "customer").select(col("c_custkey"),
          abs(col("c_acctbal")).as("ab"),
          ceil(col("c_acctbal")).cast("bigint").as("ce"),
          floor(col("c_acctbal")).cast("bigint").as("fl"),
          T.dbl(round(T.dec(col("c_acctbal")), 1)).as("rnd1"),
          sqrt(abs(col("c_acctbal"))).as("sq"),
          (col("c_custkey") % 7).as("md"),
          signum(col("c_acctbal")).cast("int").as("sg"),
          pow(col("c_nationkey"), 2).cast("bigint").as("pw"))
        .orderBy("c_custkey")
    },

    // ---- F6/F7/F8/F10: CASE WHEN / coalesce / nullif / least / greatest.
    Q("q28_conditional_fns",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(building)') AS seg,
        |  least(c_custkey % 5, cast(c_nationkey as bigint) % 5) AS lst,
        |  greatest(c_custkey % 5, cast(c_nationkey as bigint) % 5) AS grt
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      T.df(s, dir, "customer").select(col("c_custkey"),
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(building)")).as("seg"),
          least(col("c_custkey") % 5, col("c_nationkey").cast("bigint") % 5).as("lst"),
          greatest(col("c_custkey") % 5, col("c_nationkey").cast("bigint") % 5).as("grt"))
        .orderBy("c_custkey")
    },

    // ---- §2.8 JSON functions on events.props.
    Q("q29_json_fns",
      """SELECT k % 10 AS k_bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT cast(props->>'k' as bigint) AS k FROM events)
        |GROUP BY k % 10 ORDER BY k_bucket""".stripMargin) { (s, dir) =>
      T.df(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("k_bucket")
    },

    // ---- §2.8 array functions on embeddings (scalar outputs only;
    // float passthrough values are bit-identical in both engines).
    Q("q30_array_fns",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  embedding[1] AS first_v,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  list_aggregate(embedding, 'max') AS mx,
        |  label
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      T.df(s, dir, "embeddings").select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_v"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          array_max(col("embedding")).as("mx"),
          col("label"))
        .orderBy("vec_id")
    },

    // ---- F12 / UDTF role: explode (generator) + re-aggregate.
    Q("q31_explode_tokens",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
      T.df(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }
  )
}
