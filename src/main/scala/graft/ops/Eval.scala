package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, T}

/** Model-evaluation and distribution analytics (round 14) — the QA
  * pass a training-data pipeline runs over its own quality signals:
  * does the score actually discriminate (AUC), what does the value
  * distribution look like (equi-width histogram), and which records
  * are statistical outliers (exact k-sigma flagging). Each is a
  * classic whose naive form has a scale cliff — a global rank sort
  * over every scored row for AUC, a per-threshold scan for the
  * histogram, a second full sort for outliers — and each
  * implementation here carries the cliff-free shape instead.
  *
  * Exactness discipline (shared with q93/q115/q123): every ranking or
  * flagging decision is made in integer/decimal arithmetic — counts,
  * cents (2-decimal money/value columns × 100), and one terminal
  * integral division, Spark decimal(38,0)/bigint `div` vs DuckDB
  * bigint/HUGEINT `//` (the oracle must stay in DuckDB's INTEGER
  * domain: DECIMAL `//` there degrades to double true-division and
  * the BIGINT cast rounds — measured off-by-one — while HUGEINT `//`
  * truncates exactly like `div`) — so the DuckDB oracles hash
  * bit-for-bit and no float ever decides a comparison. Intermediates that can square a cents value or
  * multiply by a row count run in decimal(38,0): at 10¹² rows ×
  * 10⁶-cent values the worst product (n·Σx²) is ~10³⁶ < 10³⁸, so
  * the headroom argument survives the 100 TB target, not just the
  * fixture.
  */
object Eval {

  import org.apache.spark.sql.DataFrame

  /** Mann–Whitney AUC per group over (`source`, score `sc`, label
    * `lab` ∈ {0,1}) rows — the q138 core, factored so EvalSpec can
    * drive it on hand-computed tie fixtures. See q138's scaladoc for
    * the doubled-rank-sum derivation and the scale shape. */
  private[graft] def aucBySource(rows: DataFrame): DataFrame = {
    val g = rows.groupBy(col("source"), col("sc"))
      .agg(count(lit(1)).as("n"), sum("lab").as("np"))
    val w = Window.partitionBy("source").orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum("n").over(w), lit(0L)))
      .groupBy("source")
      .agg(sum("np").as("n_pos"),
        (sum("n") - sum("np")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum") + col("n") + 1L)).as("rs2"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(expr(
            "cast((cast(rs2 - n_pos*(n_pos+1) as decimal(38,0)) * 1000000) div " +
              "(2 * cast(n_pos as decimal(38,0)) * n_neg) as bigint)"))
          .as("auc_micro"))
      .orderBy("source")
  }

  /** Equi-width census of a `cents` column into `buckets` bins — the
    * q139 core. Bucket id = (c−mn)·buckets div (mx−mn+1) ∈
    * [0, buckets) always (no clamp needed, x = max included). */
  private[graft] def histogram(cents: DataFrame, buckets: Int): DataFrame = {
    val b = cents.agg(min("cents").as("mn"), max("cents").as("mx"))
    cents.crossJoin(broadcast(b))
      .select(when(col("mx") === col("mn"), 0L)
          .otherwise(expr(s"((cents - mn) * $buckets) div (mx - mn + 1)")).as("bucket"),
        col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("lo"), max("cents").as("hi"))
      .orderBy("bucket")
  }

  /** Per-type k-sigma outlier census over (`event_type`, cents `v`)
    * rows — the q140 core: flag iff (n·x − S)² > k²·(n·S₂ − S²),
    * all decimal(38,0)-exact. The boundary (exactly kσ) is NOT an
    * outlier under strict `>` — EvalSpec pins that edge with a
    * fixture sitting bit-exactly on it. */
  private[graft] def sigmaCensus(rows: DataFrame, k: Int): DataFrame = {
    val st = rows.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(v as decimal(38,0))")).as("sv"),
        sum(expr("cast(v as decimal(38,0)) * v")).as("sv2"))
    rows.join(broadcast(st.withColumnRenamed("event_type", "t")),
        col("event_type") === col("t"))
      .withColumn("is_out",
        when(expr("(n * cast(v as decimal(38,0)) - sv) * " +
            s"(n * cast(v as decimal(38,0)) - sv) > ${k * k} * (n * sv2 - sv * sv)"), 1L)
          .otherwise(0L))
      .groupBy("event_type")
      .agg(max("n").as("n"), sum("is_out").as("n_out"),
        coalesce(sum(when(col("is_out") === 1L, col("v"))), lit(0L)).as("out_cents"))
      .orderBy("event_type")
  }

  val qs: Seq[Q] = Seq(

    // ---- ROC AUC via the Mann–Whitney rank-sum (per source) — the
    // standard "is this quality signal worth gating on" evaluation,
    // here scoring n_chars as a detector for lang='en'. AUC =
    // (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with ties at their AVERAGE rank
    // (the exact U-statistic: tied cross pairs count ½). Everything
    // stays integer by doubling: rs2 = Σ n⁺_g·(2·cum_g + n_g + 1) is
    // twice the positive rank-sum (a group of n_g equal scores after
    // cum_g smaller rows occupies ranks cum+1..cum+n, average
    // (2·cum+n+1)/2), so auc_micro = (rs2 − n⁺(n⁺+1))·10⁶ div
    // (2·n⁺·n⁻) — exact, tie-correct, float-free. Degenerate sources
    // (single-class) NULL-gate with identical CASE predicates.
    // Plan at 100 TB: the corpus pass is ONE hash aggregate to
    // (source, score) groups with map-side partials — the global
    // sort-and-rank the textbook formula implies NEVER touches data
    // rows; the rank window runs over the aggregated frame, bounded
    // by Σ|distinct scores per source| (the q116 cardinality
    // discipline), partitioned per source so even that stage is
    // |sources|-way parallel. Output is |sources| rows.
    Q("q138_auc_ranksum",
      """WITH g AS (SELECT source, n_chars AS sc, count(*)::BIGINT AS n,
        |             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS np
        |           FROM documents GROUP BY 1, 2),
        |w AS (SELECT source, sc, n, np,
        |        coalesce(sum(n) OVER (PARTITION BY source ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |      FROM g),
        |a AS (SELECT source, sum(np)::BIGINT AS n_pos,
        |        (sum(n) - sum(np))::BIGINT AS n_neg,
        |        sum(np * (2*cum + n + 1))::BIGINT AS rs2
        |      FROM w GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |       ELSE CAST((CAST(rs2 - n_pos*(n_pos+1) AS HUGEINT) * 1000000)
        |                 // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
        |  END AS auc_micro
        |FROM a ORDER BY source""".stripMargin) { (s, dir) =>
      aucBySource(T.df(s, dir, "documents")
        .select(col("source"), col("n_chars").as("sc"),
          when(col("lang") === "en", 1L).otherwise(0L).as("lab")))
    },

    // ---- Equi-width histogram of order totals, 16 buckets — the
    // distribution profile behind every binning/banding decision
    // (and the 1-D cousin of q127's skyline grid / q130's z-grid).
    // Cents are exact (decimal(12,2)·100), bounds come from ONE
    // min/max aggregate carried as a broadcast 1-row frame — no
    // driver-side collect, so the plan composes under streaming/
    // nested reuse — and the bucket id is pure integer arithmetic:
    // (c−mn)·16 div (mx−mn+1) ∈ [0,15] always (the +1 makes the
    // least() clamp of textbook width_bucket unnecessary — no edge
    // case for x = max). Degenerate single-value frames collapse to
    // bucket 0 via the mx=mn gate, identical in both engines.
    // Plan at 100 TB: two passes over the column — the bounds
    // aggregate (map-side partials to one cell) and a map-only
    // bucket apply behind a BroadcastNestedLoopJoin of the 1-row
    // bounds frame, folding straight into a 16-group hash agg.
    // Nothing sorts, nothing shuffles data rows beyond the 16-key
    // partial agg. PlanSpec pins the broadcast + no-sort shape.
    Q("q139_histogram",
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |           FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c),
        |h AS (SELECT CASE WHEN mx = mn THEN 0
        |                  ELSE ((cents - mn) * 16) // (mx - mn + 1) END AS bucket,
        |             cents
        |      FROM c, b)
        |SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n,
        |       min(cents) AS lo, max(cents) AS hi
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      histogram(T.df(s, dir, "orders")
        .select(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")
          .as("cents")), 16)
    },

    // ---- Exact k-sigma outlier census per event type (k=3) — the
    // anomaly-detection sibling of q93's exact moments: a value is
    // flagged iff |x − μ| > 3σ, decided WITHOUT ever computing μ or
    // σ as floats. Multiply the inequality through by n²:
    // (n·x − S)² > 9·(n·S₂ − S²) where S = Σx, S₂ = Σx² over the
    // type — both sides are exact decimal(38,0) products of exact
    // cents sums, so the flag is a pure integer comparison and the
    // boundary case (exactly 3σ, NOT an outlier under strict >)
    // falls identically in both engines; a float derivation would
    // make the boundary row engine-dependent. Null values are
    // excluded up front (they have no magnitude to test).
    // Plan at 100 TB: the q123 two-pass broadcast-apply shape — one
    // partial-combined moments aggregate to |types| cells, broadcast
    // back over a map-only flag pass that folds into the |types|-row
    // census. No window ever partitions the corpus by type (|types|
    // is tiny — a per-type window would funnel everything onto
    // |types| partitions), no sort, no driver round-trip.
    Q("q140_sigma_outliers",
      """WITH c AS (SELECT event_type,
        |             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |           FROM events WHERE value IS NOT NULL),
        |st AS (SELECT event_type, count(*)::BIGINT AS n,
        |         sum(CAST(v AS DECIMAL(38,0))) AS sv,
        |         sum(CAST(v AS DECIMAL(38,0)) * v) AS sv2
        |       FROM c GROUP BY 1),
        |fl AS (SELECT c.event_type, c.v, st.n,
        |         CASE WHEN (st.n * CAST(c.v AS DECIMAL(38,0)) - st.sv)
        |                 * (st.n * CAST(c.v AS DECIMAL(38,0)) - st.sv)
        |                 > 9 * (st.n * st.sv2 - st.sv * st.sv)
        |              THEN 1 ELSE 0 END AS is_out
        |       FROM c JOIN st ON st.event_type = c.event_type)
        |SELECT event_type, max(n) AS n, sum(is_out)::BIGINT AS n_out,
        |       coalesce(sum(CASE WHEN is_out = 1 THEN v END), 0)::BIGINT AS out_cents
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      sigmaCensus(T.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(cast(value as decimal(12,2)) * 100 as bigint)").as("v")), 3)
    },

    // ---- Equi-depth (quantile) binning — q139's companion: equal
    // COUNT per bin instead of equal width, the feature-engineering
    // transform behind decile features / lift tables / monotone
    // binning. Exact equi-depth needs global ranks, so this operator
    // deliberately targets BOUNDED-DOMAIN columns (l_quantity has 50
    // distinct values): one hash aggregate to (value, count), then
    // the rank arithmetic runs over the |domain|-row frame — bin =
    // cum·10 div N, every distinct value lands WHOLLY in one bin (a
    // tie class is never split — the documented semantics, which is
    // also why bins go uneven when ties dominate; the output exposes
    // exactly that skew). For unbounded domains (near-unique money
    // columns) exact global ranks are the 100 TB cliff by
    // construction — that case is what the q104 mergeable GK sketch
    // path is for; this pair of operators is the exact/sketch split,
    // same shape as exact min/max vs withZKeySketch in Layout.
    // Plan: one partial-combined aggregate over the corpus; the
    // single-partition window stage is downstream of the ≤50-row
    // aggregate (q116 discipline), then a ≤10-row census.
    Q("q141_quantile_bins",
      """WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS q, count(*)::BIGINT AS c
        |           FROM lineitem GROUP BY 1),
        |w AS (SELECT q, c,
        |        coalesce(sum(c) OVER (ORDER BY q
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
        |        sum(c) OVER (ORDER BY q
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n
        |      FROM g),
        |b AS (SELECT (cum * 10) // n AS bin, q, c FROM w)
        |SELECT bin::BIGINT AS bin, sum(c)::BIGINT AS n_rows,
        |       count(*)::BIGINT AS n_values, min(q) AS lo, max(q) AS hi
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      quantileBins(T.df(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("q")), 10)
    }
  )

  /** Equi-depth binning census of a bounded-domain `q` column — the
    * q141 core. Every distinct value lands wholly in bin
    * (cum·bins div N); ties are never split across bins. The total N
    * rides the SAME ordered window as the running sum (one window
    * pass, identical sort spec) instead of a separate count subtree —
    * a broadcast total frame would re-derive the aggregate from a
    * second corpus scan unless exchange reuse happens to rescue it. */
  private[graft] def quantileBins(vals: DataFrame, bins: Int): DataFrame = {
    val g = vals.groupBy("q").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("q")
    g.withColumn("cum",
        coalesce(sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(expr(s"(cum * $bins) div n").as("bin"), col("q"), col("c"))
      .groupBy("bin")
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_values"),
        min("q").as("lo"), max("q").as("hi"))
      .orderBy("bin")
  }
}
