package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, plus decode/feature plumbing.
  *
  * Design for real media at 100 TB:
  *  - storage: parquet with a `binary` payload column + a metadata
  *    struct (mime, width/height/duration, codec) — payloads never
  *    leave the executor; all pruning happens on metadata columns so
  *    a metadata-only query reads none of the bytes (column pruning).
  *  - decode/feature-extract: batched per-partition UDFs
  *    ([[MediaBatch.mapDecoded]]) so a codec context is initialized
  *    once per partition, not per row — the Scala analogue of a
  *    PySpark `mapInPandas` batch UDF.
  *  - the actual codec call is STUBBED here (no image/audio libraries
  *    in this environment): [[MediaStub.decode]] is a deterministic
  *    fake (byte-slice "frames"); the Spark-side plumbing — schema,
  *    batch shape, partitioning, frame explosion — is real and is
  *    what q49 oracle-checks.
  */
object Multimodal {

  /** Typed media record: payload + metadata travel together. */
  final case class Media(doc_id: Long, bytes: Array[Byte], mime: String, byteLen: Long)
  final case class Frame(doc_id: Long, frameIdx: Int, fragHex: String)

  object MediaStub {
    /** STUB — stands in for a real image/audio decoder. Deterministic:
      * "frame" f is the 8-byte slice at offset 1 + 7·f, hex-encoded.
      * Replace with a codec call; the batch shape stays identical. */
    def decode(m: Media, frames: Int): Seq[Frame] =
      (0 until frames).map { f =>
        val off = 1 + 7 * f
        val slice = m.bytes.slice(off, off + 8)
        Frame(m.doc_id, f, slice.map("%02X".format(_)).mkString)
      }
  }

  object MediaBatch {
    /** Partition-batched decode: init-once-per-partition shape (the
      * place a codec/session handle would be created). */
    def mapDecoded(ds: Dataset[Media], frames: Int): Dataset[Frame] = {
      import ds.sparkSession.implicits._
      ds.mapPartitions { it =>
        // codec init would happen here, once per partition
        it.flatMap(m => MediaStub.decode(m, frames))
      }
    }
  }

  val qs: Seq[Q] = Seq(
    // ---- binary column plumbing, oracle-checked: the documents' text
    // bytes stand in for media payloads; the "frame sample" extraction
    // is pure binary column arithmetic on both engines.
    Q("q49_multimodal_frames",
      """WITH m AS (SELECT doc_id, text::BLOB AS payload FROM documents),
        |f AS (SELECT doc_id, octet_length(payload) AS byte_len, hex(payload) AS h,
        |             unnest([0, 1, 2]) AS frame_idx
        |      FROM m)
        |SELECT doc_id, frame_idx, byte_len,
        |       substring(h, (1 + 7 * frame_idx) * 2 + 1, 16) AS frag_hex
        |FROM f WHERE byte_len >= 30
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      T.df(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"), octet_length(col("payload")).as("byte_len"),
          hex(col("payload")).as("h"),
          explode(sequence(lit(0), lit(2))).as("frame_idx"))
        .filter(col("byte_len") >= 30)
        .select(col("doc_id"), col("frame_idx"), col("byte_len"),
          col("h").substr(col("frame_idx") * 14 + 3, lit(16)).as("frag_hex"))
        .orderBy("doc_id", "frame_idx")
    }
  )
}
