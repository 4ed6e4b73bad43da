package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * The classic lakehouse layout optimization (public literature:
  * Morton 1966; table formats expose it as `OPTIMIZE ZORDER BY`):
  * scale each column to a common k-bit domain, interleave the bits,
  * and sort by the resulting key — contiguous key ranges are unions of
  * small axis-aligned boxes in the value space, so files written in
  * that order carry TIGHT min/max footer statistics on BOTH columns
  * and a predicate on either one prunes at the footer level. A linear
  * sort on column A leaves every file spanning B's full range; raw
  * unscaled interleaving quietly degenerates to the same thing when
  * the columns' bit widths differ (an 18-bit price against a 6-bit
  * size is price-major lexicographic for all practical purposes),
  * which is why the operator scales FIRST — ZOrderSpec pins both the
  * bit math and the measured per-file range tightening vs a linear
  * layout on real parquet files.
  *
  * Scaling is exact integer min-max: s(x) = (x − min) · (2^k − 1) DIV
  * (max − min), with min/max from one aggregate over the input — the
  * q123 broadcast-stats shape, and the same eager-at-construction
  * probe as the skyline's quantile cells (documented there; the
  * constants must be literals for the key to stay a flat codegen
  * projection). The DuckDB oracle recomputes the identical scaling
  * and the identical shift-and-add interleave — disjoint bit
  * positions make `+` equal bitwise OR, so both engines use addition
  * and no OR-operator semantics are in play.
  *
  * At 100 TB this runs at ingest/compaction time: one aggregate for
  * the bounds (at scale: the percentile-sketch probe instead, same
  * machinery as the skyline cells), one range exchange on the z-key —
  * the shuffle a linear sort pays anyway — and every selective scan
  * afterward skips most files. */
object Layout {

  /** Morton z-value of two non-negative integer columns, `bits` bits
    * each: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * A flat tree of built-in shift/and/add expressions — codegen'd,
    * no UDF. */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Exact integer min-max scale of `x` into [0, 2^bits) given data
    * bounds; constant-range inputs collapse to 0 (single z-cell). */
  private def scaled(x: Column, mn: Long, mx: Long, bits: Int): Column = {
    val top = (1L << bits) - 1
    // Double division + cast-truncation equals integer floor (DuckDB's
    // `//`) ONLY while the numerator (x−mn)·top stays ≤ 2^53: both
    // operands are then double-exact, and a quotient strictly below an
    // integer k is at least 1/(mx−mn) below it while the division's
    // rounding error is < k·2^-53 ≤ top·2^-53 ≤ 1/(mx−mn) — so it can
    // never round UP onto k. The public API admits bits up to 31, where
    // that precondition is not automatic; enforce it.
    if (mx == mn) lit(0L)
    else {
      require(mx - mn <= (1L << 53) / top,
        s"z-order scale overflow: range ${mx - mn} * top $top exceeds 2^53; " +
          "reduce bits or pre-bucket the column")
      ((x - lit(mn)) * lit(top) / lit(mx - mn)).cast("long")
    }
  }

  /** The z-key for `df`'s columns (`a`, `b`): bounds from one
    * aggregate (EAGER — runs at construction, see scaladoc), then a
    * map-only scaled interleave. Returns the input columns plus
    * `zval`. This EXACT-bounds path is what the q130 oracle pins
    * bit-for-bit; at scale prefer [[withZKeySketch]]. */
  def withZKey(df: DataFrame, a: String, b: String, bits: Int): DataFrame = {
    val r = df.agg(min(a), max(a), min(b), max(b)).first()
    require(!r.isNullAt(0), "z-order over an empty frame")
    val (mna, mxa, mnb, mxb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("zval",
      zvalue(scaled(col(a), mna, mxa, bits), scaled(col(b), mnb, mxb, bits), bits))
  }

  /** The AT-SCALE bounds path the exact variant's scaladoc promises
    * (round 14): grid bounds from one `percentile_approx` probe —
    * the same mergeable-sketch machinery as the skyline cells /
    * q104 — at (`lo`, `hi`) instead of exact (min, max), with
    * out-of-range values CLAMPED to the edge cells.
    *
    * Why a sketch beats exact min/max at 100 TB even though both are
    * one partial-combined aggregate over the same scan: exact bounds
    * are FRAGILE — one corrupted record (a single 2^62 sentinel in a
    * cents column) stretches the grid so far that every real value
    * scales to cell 0 and the whole layout collapses to one z-cell,
    * silently. Quantile bounds at p0.1/p99.9 are outlier-robust: the
    * grid spans where the mass actually lives, the handful of
    * stragglers land in edge cells (clamped — layout CORRECTNESS
    * never depended on bounds, only file-skipping quality does), and
    * a bad record costs two edge files instead of the operator.
    * ZOrderSpec pins both: sketch-path layout quality matches the
    * exact path on clean data, and a poisoned sentinel collapses the
    * exact grid while the sketch grid stays tight. */
  def withZKeySketch(df: DataFrame, a: String, b: String, bits: Int,
      lo: Double = 0.001, hi: Double = 0.999, accuracy: Int = 10000): DataFrame = {
    val r = df.agg(
      percentile_approx(col(a), lit(Array(lo, hi)), lit(accuracy)).as("qa"),
      percentile_approx(col(b), lit(Array(lo, hi)), lit(accuracy)).as("qb")).first()
    require(!r.isNullAt(0), "z-order over an empty frame")
    val qa = r.getSeq[Long](0); val qb = r.getSeq[Long](1)
    def clamped(c: Column, mn: Long, mx: Long): Column =
      least(greatest(c, lit(mn)), lit(mx))
    df.withColumn("zval",
      zvalue(scaled(clamped(col(a), qa(0), qa(1)), qa(0), qa(1), bits),
        scaled(clamped(col(b), qb(0), qb(1)), qb(0), qb(1), bits), bits))
  }

  /** The matching oracle-side scaling+interleave SQL (DuckDB BIGINT
    * ops; `//` is DuckDB integer division). `a`/`b` are column names
    * in scope; bounds come from the `s` CTE columns mna/mxa/mnb/mxb. */
  private[graft] def zvalueSql(a: String, b: String, bits: Int): String = {
    val top = (1L << bits) - 1
    val sa = s"(CASE WHEN mxa = mna THEN 0 ELSE (($a - mna) * $top) // (mxa - mna) END)"
    val sb = s"(CASE WHEN mxb = mnb THEN 0 ELSE (($b - mnb) * $top) // (mxb - mnb) END)"
    (0 until bits).map { i =>
      s"((($sa >> $i) & 1) << ${2 * i + 1}) + ((($sb >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")
  }

  /** Write `df` clustered by the z-order of (`a`, `b`) into `files`
    * files: one range exchange on the z-key, in-partition sort, key
    * dropped before the write. `sketchBounds` selects the
    * outlier-robust [[withZKeySketch]] grid (the at-scale default for
    * a maintenance pass); exact bounds remain for oracle parity. */
  def writeZOrdered(df: DataFrame, a: String, b: String, bits: Int,
                    files: Int, path: String,
                    sketchBounds: Boolean = false): Unit =
    (if (sketchBounds) withZKeySketch(df, a, b, bits)
     else withZKey(df, a, b, bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** The maintenance pass proper (round 14): compaction and z-order
    * clustering as ONE staged atomic rewrite — a table that needs its
    * small files merged is being rewritten anyway, so paying a second
    * full rewrite to cluster it is pure waste; the z-order range
    * exchange replaces plain compaction's round-robin inside
    * [[graft.sinks.Sinks.compactWith]]'s swap discipline (file count
    * from bytes/target, staged sibling, two atomic renames, no mixed
    * layout ever visible). `a`/`b` are Column EXPRESSIONS over the
    * table (a maintenance pass often clusters on derived keys — a
    * map-field cast, a rounded price); they exist only as temp
    * columns during the rewrite and are dropped before the write.
    * Sketch bounds by default — the outlier-robust grid is the right
    * unattended-maintenance choice ([[withZKeySketch]]). */
  def zorderCompact(spark: SparkSession, path: String, a: Column, b: Column,
      bits: Int, targetFileBytes: Long = 128L * 1024 * 1024,
      sketchBounds: Boolean = true): Int =
    graft.sinks.Sinks.compactWith(spark, path, targetFileBytes) { (df, n) =>
      val keyed0 = df.withColumn("__za", a).withColumn("__zb", b)
      val keyed =
        if (sketchBounds) withZKeySketch(keyed0, "__za", "__zb", bits)
        else withZKey(keyed0, "__za", "__zb", bits)
      keyed.repartitionByRange(n, col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval", "__za", "__zb")
    }

  // 8 bits per dimension = 256 equal-width cells each, z in 16 bits —
  // plenty of layout resolution for any file count a compaction uses.
  private val ZBits = 8

  val qs: Seq[Q] = Seq(
    // ---- the z-key itself, oracle-gated bit-for-bit: both engines
    // compute the identical exact-integer scaling from the identical
    // data-derived bounds, then the identical 16-term shift-and-add.
    // The ORDER BY zval is the clustering order writeZOrdered lays
    // files out in — the oracle pins that the layout's sort key is
    // exactly the scaled Morton order, not an approximation.
    Q("q130_zorder_key",
      s"""WITH p AS (SELECT p_partkey,
         |             cast(round(p_retailprice * 100) as bigint) AS pc,
         |             p_size::BIGINT AS sz
         |           FROM part),
         |s AS (SELECT min(pc) AS mna, max(pc) AS mxa,
         |             min(sz) AS mnb, max(sz) AS mxb FROM p)
         |SELECT p_partkey, pc, sz,
         |       (${zvalueSql("pc", "sz", ZBits)}) AS zval
         |FROM p, s ORDER BY zval, p_partkey""".stripMargin) { (s, dir) =>
      withZKey(
        T.df(s, dir, "part")
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
            col("p_size").cast("long").as("sz")),
        "pc", "sz", ZBits)
        .orderBy("zval", "p_partkey")
    }
  )
}
