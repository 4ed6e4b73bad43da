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

  /** Apply ONE micro-batch of merged-trial updates to a parquet table
    * keyed by eudract_id — the upsert the reference performs per scan
    * into its database (`scan.py:263-278`, INSERT OR REPLACE per
    * trial), incrementalized.
    *
    * Table layout: hash-bucketed directory partitions
    * (`bucket = xxhash64(eudract_id) mod buckets`), so an upsert
    * rewrites ONLY the buckets the batch touches (dynamic partition
    * overwrite) — per-batch work is ∝ |batch| + the affected buckets'
    * resident rows, never the table. At 100 TB: `buckets` scales with
    * table size to bound rewrite amplification, and a real deployment
    * swaps this merge-on-write emulation for a table format with
    * native MERGE (Delta/Iceberg) — the sink contract (idempotent
    * per-batch apply) is exactly what those formats need too.
    *
    * IDEMPOTENT by construction: applying the same batch twice leaves
    * the same table (replaced rows replace to the same values), which
    * turns foreachBatch's at-least-once replay into exactly-once table
    * state for any batch whose overwrite COMMITTED before the crash
    * (StreamingSpec pins both the replay and the kill-and-resume
    * equivalence). The commit itself is NOT atomic — plain parquet's
    * dynamic partition overwrite can die mid-rewrite and leave an
    * affected bucket torn (duplicate or missing resident rows), and a
    * replay's left_anti removes only batch keys, so a torn bucket does
    * not self-heal. That torn-commit window is exactly what the
    * Delta/Iceberg swap above closes (atomic snapshot commit); this
    * merge-on-write emulation's guarantee is post-commit replay
    * idempotence, no more. */
  def upsertBatch(batch: Dataset[TrialUpdate], tableDir: String, buckets: Int): Unit = {
    val s = batch.sparkSession
    import org.apache.spark.sql.functions._
    import s.implicits._
    // updates are cumulative per trial, so within a batch the row that
    // has folded the most records subsumes the rest
    val latest = batch.groupByKey(_.eudract_id)
      .reduceGroups((a, b) => if (a.nRecords >= b.nRecords) a else b)
      .map(_._2)
    val rows = latest.toDF()
      .withColumn("bucket", pmod(xxhash64(col("eudract_id")), lit(buckets.toLong)))
    val merged =
      if (!new java.io.File(tableDir).exists()) rows
      else {
        val affected = rows.select("bucket").distinct().as[Long].collect()
        val keep = s.read.parquet(tableDir)
          .filter(col("bucket").isin(affected.map(Long.box).toSeq: _*))
          .join(rows.select("eudract_id"), Seq("eudract_id"), "left_anti")
        keep.unionByName(rows)
      }
    // localCheckpoint cuts the file-source lineage so the overwrite
    // below may legally target the path it just read (plain parquet
    // has no transactional MERGE; see the at-scale note above)
    val staged = merged.localCheckpoint()
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try staged.write.mode("overwrite").partitionBy("bucket").parquet(tableDir)
    finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  /** The SURVEY §2.9 sink half: merged updates land in the bucketed
    * parquet table via foreachBatch + [[upsertBatch]]. Caller picks the
    * trigger and starts; offsets checkpoint at `checkpoint`, so a
    * killed query resumed on the same checkpoint replays only
    * uncommitted batches — which [[upsertBatch]]'s idempotence turns
    * into exactly-once table state. */
  def upsertSink(updates: Dataset[TrialUpdate], tableDir: String,
                 checkpoint: String, buckets: Int = 32)
      : org.apache.spark.sql.streaming.DataStreamWriter[TrialUpdate] =
    updates.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[TrialUpdate], _: Long) =>
        upsertBatch(b, tableDir, buckets)
      }
}
