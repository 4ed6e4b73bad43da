package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic text hashing.
  *
  * Sketch operators (MinHash, SimHash, fingerprints) need a hash that
  * the DuckDB oracle can recompute bit-for-bit; engine-native hash
  * functions differ, so we define one in pure integer arithmetic that
  * both engines evaluate identically:
  *
  *   wordHash(w)   = Σ_i ascii(w[i]) * 31^(i-1)  (mod M), i = 1..24
  *   shingleHash   = (h1*31² + h2*31 + h3) (mod M)   [word 3-gram]
  *   minhash(s, S) = min over shingles ((2s+1)*sh + 7919*s mod M)
  *
  * with M = 1e9+7. All intermediates stay far below Long overflow.
  * The 24-char cap is a documented bound (tokens beyond it hash by
  * prefix); at 100 TB the same expressions run unchanged — they are
  * pure codegen'd column arithmetic, no UDF, no shuffle.
  */
object TextHash {
  val M = 1000000007L
  val MaxLen = 24

  /** 31^(i-1) mod M for i = 1..MaxLen. */
  val pow31: Seq[Long] =
    Iterator.iterate(1L)(p => p * 31 % M).take(MaxLen).toSeq

  /** SQL literal for the power table (same text works in both engines). */
  val pow31Sql: String = pow31.mkString("[", ", ", "]")

  /** Spark: hash of a (lowercased) token column. */
  def wordHash(w: Column): Column = {
    val chars = slice(split(w, ""), 1, MaxLen)
    val terms = transform(chars, (c, i) =>
      ascii(c) * element_at(typedLit(pow31), i + 1))
    aggregate(terms, lit(0L), (acc, x) => (acc + x) % M)
  }

  /** DuckDB SQL for the same hash of token expression `w` (1-based
    * lambda index; list_sum of ≤24 products then one mod). */
  def wordHashSql(w: String): String =
    s"(list_sum(list_transform(string_split_regex($w[1:${MaxLen}], ''), (c, i) -> ascii(c)::BIGINT * (${pow31Sql})[i])) % ${M})::BIGINT"

  /** Spark: combine three word hashes into a shingle hash. */
  def shingleHash(h1: Column, h2: Column, h3: Column): Column =
    (h1 * 961 + h2 * 31 + h3) % M

  def shingleHashSql(h1: String, h2: String, h3: String): String =
    s"($h1 * 961 + $h2 * 31 + $h3) % ${M}"

  /** MinHash multiplier base: 2654435761 (Knuth) mod M. Small odd
    * multipliers like (2s+1) are a TRAP: for a shingle hash h below
    * ~M/a_s the product never wraps the modulus, so every "independent"
    * hash picks the document's globally-minimal shingle and the whole
    * signature degenerates to ONE hash function — observed as an LSH
    * recall hole on a 0.98-similar pair whose single differing shingle
    * was one doc's minimum. A_s = (ABase·s) mod M keeps every
    * multiplier ≥ 1.5e7 (verified for s = 1..64), so products wrap for
    * essentially all h. */
  val ABase = 2654435761L % M

  /** Spark: minhash of a shingle-hash array for seed s (1-based). */
  def minhash(shingles: Column, s: Int): Column = {
    val a = ABase * s % M
    array_min(transform(shingles, h => (h * a + 7919L * s) % M))
  }

  def minhashSql(sh: String, s: String): String =
    s"min(($sh * ((${ABase}::BIGINT * $s) % ${M}) + 7919*$s) % ${M})"
}
