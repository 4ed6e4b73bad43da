package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential spec for q178's content-defined chunker: the HOF
  * pipeline must agree chunk-by-chunk with an independent Scala
  * re-implementation, and must exhibit the CDC locality property the
  * operator exists for — a shared passage chunks identically in both
  * host documents regardless of the unshared prefix around it.
  */
class CdcChunkSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent chunker: same contract as [[TextMining.cdcChunks]]
    * (cut after word i+2 when the 32-bit gram hash ≡ 0 mod 16). */
  private def brute(text: String): Seq[(String, Long)] = {
    val ws = text.split(" ").filter(_.nonEmpty).toSeq
    val n = ws.length
    val cuts =
      if (n < 3) Seq.empty
      else (0 to n - 3).filter { i =>
        i + 3 < n &&
          java.lang.Long.parseLong(
            md5hex(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").take(8), 16) % 16 == 0
      }.map(_ + 3)
    val bounds = (0 +: cuts).zip(cuts :+ n)
    bounds.map { case (a, b) =>
      (md5hex(ws.slice(a, b).mkString(" ")), (b - a).toLong)
    }
  }

  private val passage = (1 to 40).map(i => s"shared$i").mkString(" ")
  private val docsSeq = Seq(
    (1L, s"alpha beta gamma $passage tail one two"),
    (2L, s"completely different and much longer leading context here $passage"),
    (3L, "short doc"),
    (4L, ""),
    (5L, (1 to 120).map(i => s"w${i % 37}").mkString(" ")))

  private def chunked = {
    import spark.implicits._
    TextMining.cdcChunks(
      docsSeq.map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source"))
      .orderBy("doc_id", "idx").collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
  }

  test("chunker agrees with the independent Scala re-implementation") {
    val expected = docsSeq.flatMap { case (id, t) =>
      brute(t).map { case (h, l) => (id, h, l) }
    }
    assert(chunked.toSeq == expected)
  }

  test("a shared passage chunks identically under different prefixes (CDC locality)") {
    val byDoc = chunked.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val common = byDoc(1L).intersect(byDoc(2L))
    assert(common.nonEmpty,
      "the 40-token shared passage produced no identical chunk across hosts")
  }

  test("chunk lengths partition each document's token count exactly") {
    val lens = chunked.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    docsSeq.foreach { case (id, t) =>
      assert(lens(id) == t.split(" ").count(_.nonEmpty).toLong, s"doc $id")
    }
  }
}
