package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.registry.{FieldKind, FieldSpec}

/** Incremental trial consolidation: the batch merge (TrialMerge, A1–A3)
  * as a stateful stream over CTA records, keyed by eudract_id via
  * `mapGroupsWithState` (SURVEY §2.9).
  *
  * First-non-blank is NOT commutative, so out-of-order member-state
  * records would corrupt a naive fold; state therefore keeps
  * (min record_seq, value) per text field — order-independent and
  * O(#fields) per trial, bounded state (SURVEY §7.4.5). Flags keep the
  * max yes/no rank (yes-over-no is a commutative max — safe as-is).
  *
  * StreamingSpec pins the equivalence: records fed in SHUFFLED order
  * through this operator produce exactly the batch TrialMerge result.
  */
object StreamMerge {

  /** One extracted CTA record: non-blank field captures only. */
  final case class RecordIn(eudract_id: String, record_seq: Long, fields: Map[String, String])

  /** Per-trial merge state: value + its seq per text field; rank per flag. */
  final case class MergeState(
      textSeq: Map[String, Long],
      textVal: Map[String, String],
      flagRank: Map[String, Int],
      nRecords: Long)

  /** Merged view emitted on every update (update output mode). */
  final case class TrialUpdate(
      eudract_id: String,
      fields: Map[String, String],
      flags: Map[String, Int],
      nRecords: Long)

  private val flagNames = FieldSpec.trial.filter(_.kind == FieldKind.Flag).map(_.name).toSet

  private def fold(state: MergeState, r: RecordIn): MergeState = {
    var (ts, tv, fr) = (state.textSeq, state.textVal, state.flagRank)
    r.fields.foreach { case (name, value) =>
      if (flagNames(name)) {
        val rank = value match { case "yes" => 2; case "no" => 1; case _ => 0 }
        if (rank > fr.getOrElse(name, 0)) fr = fr.updated(name, rank)
      } else if (ts.get(name).forall(_ > r.record_seq)) {
        ts = ts.updated(name, r.record_seq)
        tv = tv.updated(name, value)
      }
    }
    MergeState(ts, tv, fr, state.nRecords + 1)
  }

  private def finalize(id: String, st: MergeState): TrialUpdate = {
    var f = st.textVal
    // consistency rewrites, same as the batch path (scan.py:103-111)
    if (f.contains("completion_date") && f.get("overall_status").contains("ongoing"))
      f = f.updated("overall_status", "not ongoing")
    if (!f.contains("meddra_soc") && f.get("meddra_level").contains("soc"))
      f.get("meddra_classification").foreach(v => f = f.updated("meddra_soc", v))
    TrialUpdate(id, f,
      st.flagRank.collect { case (k, r) if r > 0 => k -> (r - 1) },
      st.nRecords)
  }

  def update(id: String, rows: Iterator[RecordIn], state: GroupState[MergeState]): TrialUpdate = {
    val st0 = state.getOption.getOrElse(MergeState(Map(), Map(), Map(), 0L))
    val st = rows.foldLeft(st0)(fold)
    state.update(st)
    finalize(id, st)
  }

  /** Wire a stream of records into the stateful merge. */
  def run(records: Dataset[RecordIn]): Dataset[TrialUpdate] = {
    import records.sparkSession.implicits._
    records
      .groupByKey(_.eudract_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
