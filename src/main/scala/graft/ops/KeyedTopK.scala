package graft.ops

import java.nio.charset.StandardCharsets
import java.util.Arrays

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Map-side bounded top-k prune per key — the generic form of the
  * Misra–Gries candidates-then-exact discipline for per-key rank
  * windows (q67's top-k, q68's stratified sample, q101's per-query
  * retrieval).
  *
  * Why it's exact: the global per-key top-k under a total order is a
  * subset of the union of each input partition's per-key top-k. So a
  * zero-shuffle `mapPartitions` pass that keeps only each partition's
  * k best rows per key leaves every candidate the downstream rank
  * window could emit, and the window then sorts candidate sets of
  * ≤ k·partitions rows per key — never a corpus share — no matter how
  * few distinct keys exist.
  *
  * Honest relation to what Spark already does: for the exact pattern
  * `filter(row_number ≤ k)` directly over a window, Spark 4's
  * `InferWindowGroupLimit` plans the same map-side prune natively
  * (a Partial WindowGroupLimit before the exchange), so the plain
  * window is NOT a one-task corpus-share sort there. What this
  * operator adds over the native rule: the map side selects with a
  * bounded heap — O(n·log k) comparisons and k·|keys-in-partition|
  * memory, versus the native Partial limit which first FULLY SORTS
  * each input partition (O(n·log n), spillable) — and the prune
  * composes with consumers that are not a literal rank filter (a
  * shortlist feeding a re-rank join, an aggregation over the
  * candidates) where the native rule does not fire.
  *
  * Contract:
  *  - `ord` must be a TOTAL order within each key group (include a
  *    unique tiebreak column, e.g. the row id) — otherwise the
  *    boundary row the prune keeps is arbitrary, exactly as the
  *    downstream `row_number` tie would be. Collisions between
  *    retained rows throw (best-effort detection; a collision with an
  *    already-evicted row cannot affect the surviving top-k).
  *  - `ord` values must be non-null (throws otherwise): null ordering
  *    differs between engines, and every call site orders on
  *    engine-generated non-null keys.
  *  - Per-task memory is ≤ k rows per distinct key *in that
  *    partition*: bounded-cardinality strata cost k·|strata|; a
  *    high-cardinality key degrades gracefully toward pass-through
  *    (the prune keeps ~everything, and the window was per-row-group
  *    small anyway).
  */
object KeyedTopK {

  /** Prune `df` so that, per distinct `keys` tuple, the k smallest
    * rows under `ord` ((column, ascending) pairs, compared in order)
    * all survive. Schema is unchanged; row multiplicity outside the
    * per-partition top-k is reduced. Compose with the original rank
    * window downstream — results are row-identical to running that
    * window on the full frame. */
  def prune(df: DataFrame, keys: Seq[String], ord: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val cmps = ord.map { case (c, asc) => fieldCmp(schema, c, asc) }.toArray
    val cmp: Ordering[Row] = (a: Row, b: Row) => {
      var i = 0
      var r = 0
      while (r == 0 && i < cmps.length) { r = cmps(i)(a, b); i += 1 }
      r
    }
    val out = df.mapPartitions { it =>
      val best = scala.collection.mutable.Map[List[Any],
        scala.collection.mutable.TreeSet[Row]]()
      it.foreach { row =>
        val key = keyIdx.map(i => row.get(i)).toList
        val set = best.getOrElseUpdate(key,
          scala.collection.mutable.TreeSet.empty(cmp))
        if (!set.add(row)) throw new IllegalArgumentException(
          s"keyedTopK ord collision on key $key: ord columns " +
            s"${ord.map(_._1).mkString(",")} must be unique per key group")
        if (set.size > k) set -= set.last
      }
      best.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    out.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** Per-column comparator matching Spark's own sort semantics for
    * the supported types (strings compare as UTF-8 bytes unsigned,
    * like UTF8String — Java's UTF-16 compareTo diverges above the
    * BMP). */
  private def fieldCmp(schema: StructType, name: String,
      asc: Boolean): (Row, Row) => Int = {
    val i = schema.fieldIndex(name)
    val base: (Row, Row) => Int = schema(i).dataType match {
      case LongType    => (a, b) => java.lang.Long.compare(a.getLong(i), b.getLong(i))
      case IntegerType => (a, b) => java.lang.Integer.compare(a.getInt(i), b.getInt(i))
      case DoubleType  => (a, b) => java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
      case FloatType   => (a, b) => java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
      case BooleanType => (a, b) => java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
      case StringType  => (a, b) => Arrays.compareUnsigned(
        a.getString(i).getBytes(StandardCharsets.UTF_8),
        b.getString(i).getBytes(StandardCharsets.UTF_8))
      case _: DecimalType => (a, b) => a.getDecimal(i).compareTo(b.getDecimal(i))
      case dt => throw new IllegalArgumentException(
        s"keyedTopK: unsupported ord column type $dt for $name")
    }
    val nn: (Row, Row) => Int = (a, b) => {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"keyedTopK: null ord value in $name — ord columns must be non-null")
      base(a, b)
    }
    if (asc) nn else (a, b) => -nn(a, b)
  }
}
