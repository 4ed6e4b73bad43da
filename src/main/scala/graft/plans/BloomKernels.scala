package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership kernel — the map-side half of a
  * decontamination anti-join (q81).
  *
  * WHY: screening a 100 TB corpus against a benchmark/blocklist key set
  * must not shuffle the corpus. A bloom filter built over the SMALL
  * side (eval-suite shingles — millions of keys, not billions) turns
  * the membership probe into a per-row projection: the corpus scan
  * stays map-only, only the tiny candidate set that survives the probe
  * ever reaches a real join. False positives are resolved by that
  * exact join; false negatives are impossible BY CONSTRUCTION, so the
  * candidate set is a superset of the truth and the final answer is
  * exact — the same two-phase shape Spark's own runtime row-group
  * filtering uses, lifted to an operator the user can aim at any
  * blocklist.
  *
  * The serialized filter ships as a TORRENT BROADCAST (one copy per
  * executor), not as a plan literal — a 10M-key / 1% filter is ~12 MB,
  * which would bloat every task's serialized plan. */
object BloomKernels {

  /** Distributed build over a (small) key frame: one treeAggregate-style
    * job via `stat.bloomFilter`, serialized and broadcast. `keys` must
    * be a single LONG column. */
  def buildBroadcast(s: SparkSession, keys: DataFrame, col: String,
                     expectedItems: Long, fpp: Double): Broadcast[Array[Byte]] = {
    val bloom = keys.stat.bloomFilter(col, expectedItems.max(1L), fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    s.sparkContext.broadcast(bos.toByteArray)
  }

  /** Count of `arr` elements (array<long>) that MIGHT be in the bloom —
    * an upper bound on the exact hit count (never an undercount). */
  def bloomHits(arr: Column, bloom: Broadcast[Array[Byte]]): Column =
    column(BloomCountContains(expression(arr), bloom))
}

/** arr: array<long> → how many elements hit the bloom filter. Null
  * array → null (nullSafeEval); null elements never hit (a bloom over
  * longs has no null member). Deserialized once per executor from the
  * broadcast bytes, probed in a compiled loop. */
case class BloomCountContains(child: Expression, bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression {
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_count_contains"

  def hits(a: ArrayData): Long = {
    val n = a.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (!a.isNullAt(i) && bloom.mightContainLong(a.getLong(i))) c += 1L
      i += 1
    }
    c
  }

  protected override def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomKernel", this, classOf[BloomCountContains].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hits(($c));")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomCountContains =
    copy(child = newChild)
}
