package graft.registry

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** One raw IMP entry: (record_seq, pos) give its deterministic
  * first-occurrence order within the trial. */
final case class ImpRaw(seq: Long, pos: Int, trade: String, product: String, code: String)
/** Per-segment entry as extracted (no record_seq yet). */
final case class ImpSeg(pos: Int, trade: String, product: String, code: String)
/** Aggregator input: one record's (seq, extracted IMP entries). */
final case class ImpRecord(seq: Long, imps: Seq[ImpSeg])
final case class ImpBuf(items: Seq[ImpRaw])
final case class ImpOut(trade: String, product: String, code: String)

/** IMP fuzzy duplicate consolidation (reference scan.py:135-188) as a
  * typed Spark [[Aggregator]] — the one genuinely custom aggregate the
  * parity surface needs (SURVEY §7.3).
  *
  * Semantics replicated exactly: two entries are the same product when
  * ANY of {trade, product, code} is non-empty-equal (scan.py:135-145);
  * on a match keep the SHORTER non-empty trade and product
  * (scan.py:169-174), fill blanks from the duplicate (scan.py:177-179),
  * swap-delete and rescan (scan.py:181-187) — which makes the merge
  * transitive (connected components over the 3-attribute match graph).
  *
  * The reference's scan order is file order; Spark input order is
  * partition-dependent, so [[finish]] first sorts by (record_seq, pos) —
  * the explicit determinism the reference gets for free from its
  * single-threaded read (SURVEY §7.4.2).
  *
  * Scale: per-trial IMP lists are bounded (≤ #member-states × IMPs per
  * CTA, tens of entries), so the O(n²) pairwise loop is constant-time
  * per key; the aggregate is partial-merge-friendly (buffers concat),
  * so Spark plans a map-side partial aggregation before the single
  * shuffle on eudract_id.
  */
object ImpDedup extends Aggregator[ImpRecord, ImpBuf, Seq[ImpOut]] {

  def zero: ImpBuf = ImpBuf(Vector.empty)
  def reduce(b: ImpBuf, a: ImpRecord): ImpBuf =
    ImpBuf(b.items ++ a.imps.map(i => ImpRaw(a.seq, i.pos, i.trade, i.product, i.code)))
  def merge(b1: ImpBuf, b2: ImpBuf): ImpBuf = ImpBuf(b1.items ++ b2.items)

  def finish(b: ImpBuf): Seq[ImpOut] = {
    val sorted = b.items.sortBy(i => (i.seq, i.pos))
    val list = ArrayBuffer.from(sorted.map(i => Array(i.trade, i.product, i.code)))
    consolidate(list).map(a => ImpOut(a(0), a(1), a(2))).toSeq
  }

  /** The reference's pairwise swap-delete loop, verbatim semantics. */
  private[registry] def consolidate(list: ArrayBuffer[Array[String]]): ArrayBuffer[Array[String]] = {
    def fieldsMatch(a: String, b: String): Boolean = a.nonEmpty && a == b
    var top = list.length
    if (top > 1) {
      var ok = 0
      while (ok != top) {
        var cur = ok + 1
        while (cur != top) {
          val o = list(ok); val c = list(cur)
          if (fieldsMatch(o(0), c(0)) || fieldsMatch(o(1), c(1)) || fieldsMatch(o(2), c(2))) {
            if (o(0).length > c(0).length && c(0).nonEmpty) o(0) = c(0)
            if (o(1).length > c(1).length && c(1).nonEmpty) o(1) = c(1)
            var i = 0
            while (i < o.length) { if (o(i).isEmpty) o(i) = c(i); i += 1 }
            list(cur) = list(top - 1)
            top -= 1
          } else cur += 1
        }
        ok += 1
      }
    }
    list.take(top)
  }

  def bufferEncoder: Encoder[ImpBuf] = Encoders.product[ImpBuf]
  def outputEncoder: Encoder[Seq[ImpOut]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[ImpOut]]()
  }
}
