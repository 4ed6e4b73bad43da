package graft.plans

import graft.SparkSpec
import graft.llm.{LlmText, TextHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential validation of the native text kernels against the
  * declarative formulations they replaced: the kernels must be
  * BIT-IDENTICAL to the HOF/relational paths (which are themselves
  * oracle-validated against DuckDB), on the fixture corpus AND on
  * adversarial strings the fixture doesn't contain. */
class TextKernelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Edge strings: empties, space runs, >24-cp tokens, non-ASCII
    * (ascii() returns full code points), a surrogate pair (split("")
    * is code-point aware), repeated tokens/shingles. */
  private def edgeDf: DataFrame = {
    import spark.implicits._
    Seq(
      "",
      " ",
      "   ",
      "one",
      "one two",
      "a b a b a b a b",
      "x " * 50 + "x",
      "the quick brown fox jumps over the lazy dog",
      "supercalifragilisticexpialidocious antidisestablishmentarianism",
      "éclair über straße ß",
      "😀 emoji 😀x mixed",
      "a  b   c    d",
      " leading and trailing ",
      ("tok" * 20) + " short"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def hofTokenHashes(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      transform(LlmText.tokens(lower(col("text"))), w => TextHash.wordHash(w)).as("hs"))

  test("TokenHashes kernel == HOF tokens+wordHash formula on fixture and edge strings") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    for (df <- Seq(docs, edgeDf)) {
      val kernel = df.select(col("doc_id"),
        TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      val hof = hofTokenHashes(df)
      assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty,
        "kernel token hashes diverge from the HOF formulation")
    }
  }

  test("TokenHashes kernel == dictionary-join relational path (the rounds-2-5 formulation)") {
    val (plan, dict) = LlmText.tokenHashArrPlan(spark, dir, Long.MaxValue)
    val rel = plan.select(col("doc_id"), col("hs"))
    val kernel = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel token hashes diverge from the dictionary-join path")
    dict.unpersist()
  }

  test("ShingleSet kernel == array_distinct HOF formulation (order included)") {
    val base = hofTokenHashes(edgeDf.union(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")))
      .filter(size(col("hs")) >= 3) // HOF path's sequence(1,0) is degenerate below 3 tokens
    val hof = base.select(col("doc_id"), array_distinct(transform(
      sequence(lit(1), greatest(size(col("hs")) - 2, lit(0))),
      i => TextHash.shingleHash(element_at(col("hs"), i), element_at(col("hs"), i + 1),
        element_at(col("hs"), i + 2)))).as("sh"))
    val kernel = base.select(col("doc_id"), TextKernels.shingleSet(col("hs")).as("sh"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty,
      "kernel shingle sets diverge from the HOF formulation")
  }

  test("ShingleSet kernel: < 3 tokens yields an empty set (matches oracle's no-shingle rows)") {
    import spark.implicits._
    val out = Seq((1L, "one two"), (2L, "one"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextKernels.shingleSet(TextKernels.tokenHashes(lower(col("text")))).as("sh"))
      .collect()
    assert(out.forall(_.getSeq[Long](1).isEmpty))
  }

  test("MinHashBands kernel == relational explode + 64 min-aggregates + band fold") {
    import TextHash.{ABase, M}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        TextKernels.shingleSet(TextKernels.tokenHashes(lower(col("text")))).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("h"))
    val sigCols = (1 to 64).map(sd =>
      min((col("h") * (ABase * sd % M) + 7919L * sd) % M).as(s"m$sd"))
    val sig = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandKeys = (0 until 16).map { b =>
      ((((col(s"m${4 * b + 1}") * 31
        + col(s"m${4 * b + 2}")) % M * 31
        + col(s"m${4 * b + 3}")) % M * 31
        + col(s"m${4 * b + 4}")) % M)
    }
    val rel = sig.select(col("doc_id"), array(bandKeys: _*).as("bands"))
    val kernel = docs.select(col("doc_id"),
      TextKernels.minhashBands(col("sh")).as("bands"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel band keys diverge from the relational formulation")
  }

  test("SimHash kernel == relational 30-conditional-sum formulation") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    val bitAccs = (0 until 30).map(k =>
      sum(shiftright(col("h"), k) % 2 * 2 - 1).as(s"acc$k"))
    val rel = base.select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy("doc_id")
      .agg(bitAccs.head, bitAccs.tail: _*)
      .select(col("doc_id"),
        (0 until 30).map(k => when(col(s"acc$k") > 0, LlmText.pow2(k)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
    val kernel = base.select(col("doc_id"), TextKernels.simhash(col("hs")).as("simhash"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel simhash diverges from the relational formulation")
  }

  /** edgeDf with ids shifted clear of the fixture's — the relational
    * reference paths below group by doc_id, so a collision would merge
    * two different texts into one "document". */
  private def edgeDfShifted: DataFrame =
    edgeDf.select((col("doc_id") + 100000L).as("doc_id"), col("text"))

  test("RepetitionStats kernel == relational bigram-join + shingle-distinct formulation") {
    import TextHash.M
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .union(edgeDfShifted)
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    val tok = base.select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
    val s2 = tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(col("a.doc_id").as("doc_id"),
        ((col("a.h") * 31 + col("b.h")) % M).as("bh"))
      .groupBy("doc_id", "bh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n2_total"), count(lit(1)).as("n2_distinct"), max("c").as("top2_cnt"))
    val rel = base
      .select(col("doc_id"), size(col("hs")).as("n"),
        size(TextKernels.shingleSet(col("hs"))).cast("long").as("n3_distinct"))
      .join(s2, Seq("doc_id"), "left")
      .select(col("doc_id"), array(
        coalesce(col("n2_total"), lit(0L)),
        coalesce(col("n2_distinct"), lit(0L)),
        coalesce(col("top2_cnt"), lit(0L)),
        greatest(col("n") - 2, lit(0)).cast("long"),
        col("n3_distinct")).as("st"))
    val kernel = base.select(col("doc_id"), TextKernels.repetitionStats(col("hs")).as("st"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel repetition stats diverge from the relational formulation")
  }

  test("ChunkHashes kernel == relational chunk-grouped positional-sum formulation") {
    import TextHash.M
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .union(edgeDfShifted)
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    val rel = base
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
      .groupBy(col("doc_id"), (col("pos") / 10).cast("int").as("chunk"))
      .agg((sum((col("h") * element_at(typedLit(TextHash.pow31.toArray),
        (col("pos") % 10).cast("int") + 1)) % M) % M).as("chash"))
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("chunk"), col("chash")))),
        p => p.getField("chash")).as("chs"))
    val kernel = base.select(col("doc_id"), TextKernels.chunkHashes(col("hs")).as("chs"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel chunk hashes diverge from the relational formulation")
  }

  test("sliding ChunkHashes == relational window-join formulation (stride 5, len 10)") {
    import TextHash.M
    val (len, stride) = (10, 5)
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .union(edgeDfShifted)
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
    val tok = base.select(col("doc_id"), size(col("hs")).as("n"),
      posexplode(col("hs")).as(Seq("pos", "h")))
    val ks = base.select(col("doc_id"),
      explode(sequence(lit(0), ((size(col("hs")) - 1) / stride).cast("int"))).as("k"))
    val rel = ks.join(tok, "doc_id")
      .filter(col("pos") >= col("k") * stride && col("pos") < col("k") * stride + len)
      .groupBy("doc_id", "k")
      .agg((sum((col("h") * element_at(typedLit(TextHash.pow31.toArray),
        (col("pos") - col("k") * stride).cast("int") + 1)) % M) % M).as("chash"))
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("k"), col("chash")))),
        p => p.getField("chash")).as("chs"))
    val kernel = base.select(col("doc_id"),
      TextKernels.slidingChunkHashes(col("hs"), len, stride).as("chs"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "sliding kernel diverges from the relational window-join formulation")
  }

  test("sliding ChunkHashes edges: stride==len is q64's chunker; partial tails; bad stride rejected") {
    import spark.implicits._
    val df = Seq((1L, Seq(3L, 5L, 7L, 11L, 13L)), (2L, Seq(17L)), (3L, Seq.empty[Long]))
      .toDF("doc_id", "hs")
    val same = df.select(col("doc_id"), TextKernels.chunkHashes(col("hs")).as("a"),
        TextKernels.slidingChunkHashes(col("hs"), 10, 10).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(same == 0, "stride==len must reproduce the non-overlapping chunker")
    // len 3, stride 2 over 5 tokens -> windows at 0,2,4 (last is 1 token)
    val got = df.filter(col("doc_id") === 1)
      .select(TextKernels.slidingChunkHashes(col("hs"), 3, 2))
      .collect()(0).getSeq[Long](0)
    import TextHash.{M => m}
    val p = TextHash.pow31
    assert(got == Seq(
      (3 * p(0) + 5 * p(1) + 7 * p(2)) % m,
      (7 * p(0) + 11 * p(1) + 13 * p(2)) % m,
      (13 * p(0)) % m))
    intercept[IllegalArgumentException] {
      graft.plans.ChunkHashes(null, 5, 6)
    }
  }

  test("QualityStats kernel == four-HOF formulation (null max on token-less text)") {
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .union(edgeDfShifted)
    val t = LlmText.tokens(col("text"))
    val rel = base.select(col("doc_id"), array(
      size(t).cast("long"),
      size(array_distinct(t)).cast("long"),
      array_max(transform(t, w => length(w))).cast("long"),
      size(filter(t, w => length(w) > 6)).cast("long")).as("st"))
    val kernel = base.select(col("doc_id"),
      TextKernels.qualityStats(lower(col("text"))).as("st"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel quality stats diverge from the HOF formulation")
  }

  test("LangScores kernel == explode_outer + conditional-count formulation") {
    val profiles = Seq(
      Seq("the", "a", "of", "and", "in"),
      Seq("der", "die", "und", "das", "ist"),
      Seq("el", "la", "y", "los", "que"),
      Seq("le", "les", "et", "des", "un"))
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .union(edgeDfShifted)
    val aggs = profiles.zipWithIndex.map { case (ws, i) =>
      sum(when(col("w").isin(ws: _*), 1L).otherwise(0L)).as(s"n$i")
    }
    val rel = base
      .select(col("doc_id"), explode_outer(LlmText.tokens(col("text"))).as("w"))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until 4).map(i => col(s"n$i")): _*).as("sc"))
    val kernel = base.select(col("doc_id"),
      TextKernels.langScores(lower(col("text")), profiles).as("sc"))
    assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty,
      "kernel language scores diverge from the relational formulation")
  }

  test("RepetitionStats/ChunkHashes edges: empty, single, repeated, partial chunks") {
    import spark.implicits._
    def stats(text: String): Seq[Long] =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(TextKernels.repetitionStats(
          TextKernels.tokenHashes(lower(col("text")))).as("st"))
        .collect().head.getSeq[Long](0)
    assert(stats("") == Seq(0L, 0L, 0L, 0L, 0L))
    assert(stats("one") == Seq(0L, 0L, 0L, 0L, 0L))
    assert(stats("one two") == Seq(1L, 1L, 1L, 0L, 0L))
    // "a b a b a b": bigrams ab,ba,ab,ba,ab -> total 5, distinct 2, top 3
    assert(stats("a b a b a b") == Seq(5L, 2L, 3L, 4L, 2L))
    def chunks(text: String): Seq[Long] =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(TextKernels.chunkHashes(
          TextKernels.tokenHashes(lower(col("text")))).as("chs"))
        .collect().head.getSeq[Long](0)
    assert(chunks("") == Seq.empty)
    assert(chunks("a b c").size == 1)                       // one partial chunk
    assert(chunks(("w " * 10).trim).size == 1)              // exactly one full chunk
    assert(chunks(("w " * 11).trim).size == 2)              // full + partial
    assert(chunks(("w " * 20).trim).distinct.size == 1)     // identical chunks hash equal
  }

  test("null text/arrays propagate null; null array elements hash as 0 (total, no crash)") {
    import spark.implicits._
    val withNullText = Seq((1L, null: String), (2L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextKernels.tokenHashes(lower(col("text"))).as("hs"))
      .collect().sortBy(_.getLong(0))
    assert(withNullText.head.isNullAt(1))
    assert(withNullText(1).getSeq[Long](1).size == 3)
    val nullElems = spark.sql(
      "SELECT array(1::BIGINT, NULL, 2::BIGINT, NULL, 3::BIGINT) AS hs")
    assert(nullElems.select(TextKernels.shingleSet(col("hs"))).collect()
      .head.getSeq[Long](0).nonEmpty)
    assert(nullElems.select(TextKernels.minhashBands(col("hs"))).collect()
      .head.getSeq[Long](0).size == 16)
    nullElems.select(TextKernels.simhash(col("hs"))).collect()
    assert(nullElems.select(TextKernels.repetitionStats(col("hs"))).collect()
      .head.getSeq[Long](0).head == 4L) // 5 elements -> 4 bigrams, nulls as 0
    assert(nullElems.select(TextKernels.chunkHashes(col("hs"))).collect()
      .head.getSeq[Long](0).size == 1)
  }
}
