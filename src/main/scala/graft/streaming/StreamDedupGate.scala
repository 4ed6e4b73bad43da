package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming near-dup INGEST GATE (SURVEY §2.9 composed with the q41
  * LSH family): documents arrive as a stream; a doc is accepted only
  * if no verified near-dup (exact Jaccard ≥ 1/2, q41's threshold) was
  * seen before it. The batch operators answer "which docs duplicate
  * the corpus" after the fact; this is the front-door shape a 100 TB
  * ingest actually runs — reject clones as they land, never re-scan
  * the corpus.
  *
  * Semantics: DOMINANCE dedup, first-seen-wins — a doc is rejected iff
  * some EARLIER-SEEN doc (any earlier batch, or a smaller doc_id in
  * its own batch) is a verified near-dup, whether or not that earlier
  * doc was itself accepted (in a chain A~B, B~C, A≁C: B is rejected
  * against A, and C is rejected against B even though B was dropped —
  * B was SEEN, not kept). Comparing against seen-not-kept makes the
  * decision history-free — greedy kept-only comparison would instead
  * make acceptance depend on batch boundaries. The invariant is
  * FIRST-SEEN-WINS: in every near-dup pair, the doc seen later is
  * dropped (cross-batch dominance is arrival order; within a batch,
  * doc_id order breaks the tie). For a doc_id-ORDERED stream — any
  * chunking of it — "seen later" coincides with "larger doc_id", so
  * the end state is exactly "drop every doc_b of the corpus-wide
  * near-dup pair list" (q41's pairs have doc_a < doc_b), identical
  * for every chunking; under ARBITRARY arrival orders the end state
  * is still deterministic given the order, but it is the
  * first-seen-wins set, not q41's canonical doc_b-drop (a doc_b
  * arriving in an earlier batch than its doc_a partner survives and
  * drops the doc_a). StreamDedupGateSpec pins the batch equivalence
  * for doc_id-ordered chunkings and the replay idempotence.
  *
  * State = three batch-append parquet stores under `stateDir`, one
  * subdir per batch (`batch=N` — replaying batch N OVERWRITES its own
  * subdir, so at-least-once foreachBatch delivery yields exactly-once
  * state; the same post-commit-replay envelope as
  * [[StreamMerge.upsertBatch]], and the same non-atomic-commit caveat):
  *  - `bands/`: (doc_id, band, bkey) for EVERY seen doc — 16 fixed
  *    rows per doc, the probe index (at scale: the bucketed band
  *    table of [[graft.llm.LlmText.writeBandIndex]]);
  *  - `sh/`: (doc_id, sh) distinct-shingle arrays for exact verify;
  *  - `accepted/`: (doc_id, text) — the gated output.
  *
  * Per batch the work is: map-only kernels over the batch (signatures
  * never recomputed for the corpus), one band-key join of batch bands
  * against the index (shuffle ∝ |batch|; the index side reads
  * bucket-aligned when deployed over the bucketed table), one
  * self-join of the batch's own bands, and exact verify on the
  * candidates — work ∝ |batch| × collision rate, never |corpus|²
  * (q89's incremental argument, made streaming). */
object StreamDedupGate {

  /** Band + shingle projection of a (doc_id, text) frame — the same
    * kernel family as q41/q89 (identical constants, so gate decisions
    * equal the batch operators'). */
  private def shingled(batch: DataFrame): DataFrame =
    batch
      .select(col("doc_id"), graft.plans.TextKernels.shingleSet(
        graft.plans.TextKernels.tokenHashes(lower(col("text")))).as("sh"))
      .filter(size(col("sh")) > 0)

  private def bandsOf(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"),
        posexplode(graft.plans.TextKernels.minhashBands(col("sh"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))

  /** Seen-store read, EXCLUDING `batchId`'s own subdir: a crash after
    * the state writes but before the accepted write leaves this
    * batch's bands already in the store — a replay reading them would
    * reject every batch doc as a near-dup of itself. Replay must see
    * exactly the pre-batch state. */
  private def readPrior(s: SparkSession, dir: String, batchId: Long): Option[DataFrame] =
    if (new java.io.File(dir).isDirectory &&
        new java.io.File(dir).listFiles()
          .exists(f => f.getName.startsWith("batch=") && f.getName != s"batch=$batchId"))
      Some(s.read.parquet(dir)
        .filter(col("batch") =!= batchId).drop("batch"))
    else None

  /** Apply ONE micro-batch: decide accepted docs against everything
    * seen so far, then append this batch's bands/shingles to the seen
    * store and its accepted docs to the output — each write targeting
    * only `batch=$batchId` (replay-idempotent). Returns the number of
    * accepted docs (for logs/metrics; the stores are the output). */
  def acceptBatch(batch: DataFrame, stateDir: String, batchId: Long): Long = {
    val s = batch.sparkSession
    val docs = batch.select("doc_id", "text")
    val sh = shingled(docs).localCheckpoint() // cut lineage: reused 4×
    val bands = bandsOf(sh)

    // candidates: earlier-seen docs (prior batches dominate the whole
    // batch; within the batch, smaller doc_id dominates)
    val priorCands = readPrior(s, s"$stateDir/bands", batchId) match {
      case Some(idx) => bands.join(
          idx.select(col("doc_id").as("prior_id"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .select(col("doc_id"), col("prior_id"))
      case None => s.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("prior_id")).limit(0)
    }
    val withinCands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("prior_id"))
    val cands = priorCands.unionByName(withinCands).distinct()

    // exact verify (q41's discipline: LSH proposes, Jaccard decides)
    val allSh = readPrior(s, s"$stateDir/sh", batchId)
      .map(_.unionByName(sh)).getOrElse(sh)
      .select(col("doc_id").as("prior_id"), col("sh").as("sh_p"))
    val rejected = cands
      .join(sh, "doc_id").join(allSh, "prior_id")
      .withColumn("inter", size(array_intersect(col("sh"), col("sh_p"))))
      .withColumn("uni", size(col("sh")) + size(col("sh_p")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("doc_id").distinct()

    val accepted = docs.join(rejected, Seq("doc_id"), "left_anti")
      .localCheckpoint() // decide BEFORE the seen-store grows below
    bands.write.mode("overwrite").parquet(s"$stateDir/bands/batch=$batchId")
    sh.write.mode("overwrite").parquet(s"$stateDir/sh/batch=$batchId")
    accepted.write.mode("overwrite").parquet(s"$stateDir/accepted/batch=$batchId")
    accepted.count()
  }

  /** Wire a (doc_id, text) stream through the gate. Caller picks the
    * trigger and starts; offsets checkpoint at `checkpoint`, replayed
    * batches overwrite their own `batch=N` state subdirs. */
  def gateSink(docs: DataFrame, stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        acceptBatch(b.toDF(), stateDir, id); ()
      }
}
