package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for q215's embedding-space decontamination census: the
  * end-to-end stream (stage → micro-batches → SRP sketch → exact
  * integer-cosine verify → exactly-once store → census) must match an
  * independent brute force (its own md5-parity signs, BigInt
  * arithmetic) on an engineered fixture — a near-copy of a benchmark
  * vector, a just-below-threshold arrival, an orthogonal clean one, a
  * NEGATED copy (cos = −1: signed, not |cos|), and a zero vector —
  * and decisions must be batching-invariant (1-batch ≡ 3-batch).
  * Census counting laws run on the driver fixture. */
class EmbDeconGateSpec extends SparkSpec {

  private val q215 =
    graft.SparkEntry.all.find(_.name == "q215_emb_decon_gate").get

  // (vec_id, embedding, label): vec_id % 20 == 0 is benchmark.
  //   bench 0  = e1, bench 20 = e2 (unit axes)
  //   1: 0.99·e1            -> cos 0.99 vs bench0  -> flagged
  //   2: e3                 -> orthogonal           -> clean
  //   3: zero vector        -> dq = 0, fenced       -> clean
  //   4: −e1                -> cos −1 (signed rule) -> clean
  //   5: (0.44, 0.898,0,0)  -> 0.44 vs b0, 0.898 vs b20 -> flagged (by b20)
  //   6: (0.44, 0, 0.898,0) -> 0.44 vs b0, 0 vs b20 -> clean (boundary)
  private val fixture: Seq[(Long, Seq[Float], Int)] = Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (20L, Seq(0f, 1f, 0f, 0f), 0),
    (1L, Seq(0.99f, 0.01f, 0f, 0f), 0),
    (2L, Seq(0f, 0f, 1f, 0f), 0),
    (3L, Seq(0f, 0f, 0f, 0f), 1),
    (4L, Seq(-1f, 0f, 0f, 0f), 1),
    (5L, Seq(0.44f, 0.898f, 0f, 0f), 1),
    (6L, Seq(0.44f, 0f, 0.898f, 0f), 1))

  private def writeEmb(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("embdecon").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/_staging")
    val part = new java.io.File(s"$dir/_staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "embeddings.parquet"))
    dir
  }

  // ---- independent brute force: its own signs, BigInt arithmetic ----
  private def bruteSigns(planes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(planes, dim) { (p, j) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray

  private def sig(q: Array[Long], signs: Array[Array[Long]]): Long =
    signs.zipWithIndex.foldLeft(0L) { case (acc, (row, p)) =>
      val d = row.zip(q).map { case (s, x) => s * x }.sum
      if (d > 0) acc | (1L << p) else acc
    }

  /** (vec_id -> (cand, flagged, hitTrue)) for the non-benchmark rows. */
  private def bruteDecisions(rows: Seq[(Long, Seq[Float], Int)])
      : Map[Long, (Long, Long, Long)] = {
    val dim = rows.head._2.size
    val signs = bruteSigns(16, dim)
    val bench = rows.filter(_._1 % 20 == 0).map { case (_, v, _) =>
      val q = quant(v); (sig(q, signs), q.map(x => BigInt(x) * x).sum, q)
    }
    rows.filterNot(_._1 % 20 == 0).map { case (id, v, _) =>
      val qa = quant(v)
      val sa = sig(qa, signs)
      val n2a = qa.map(x => BigInt(x) * x).sum
      val per = bench.map { case (sb, n2b, qb) =>
        val ham = java.lang.Long.bitCount(sa ^ sb)
        val dq = qa.zip(qb).map { case (x, y) => BigInt(x) * y }.sum
        val hit = dq > 0 && BigInt(1000000) * dq * dq >= BigInt(202500) * n2a * n2b
        (ham, hit)
      }
      id -> (
        if (per.exists(_._1 <= EmbDeconGate.HamCut)) 1L else 0L,
        if (per.exists(p => p._1 <= EmbDeconGate.HamCut && p._2)) 1L else 0L,
        if (per.exists(_._2)) 1L else 0L)
    }.toMap
  }

  test("engineered fixture: near-copy flagged, boundary/orthogonal/negated/zero clean") {
    val dir = writeEmb(fixture)
    val out = q215.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    // brute expectation, aggregated per label
    val dec = bruteDecisions(fixture)
    // semantic spot checks BEFORE trusting brute ≡ engine: the
    // engineered intents must hold in the brute itself
    assert(dec(1L)._2 == 1L, "near-copy must flag")
    assert(dec(5L)._2 == 1L, "second-bench hit must flag")
    assert(dec(2L)._2 == 0L && dec(3L)._2 == 0L && dec(4L)._2 == 0L &&
      dec(6L)._2 == 0L, "clean/zero/negated/boundary must pass")
    val expect = fixture.filterNot(_._1 % 20 == 0).groupBy(_._3).toSeq
      .sortBy(_._1).map { case (label, rs) =>
        val ds = rs.map(r => dec(r._1))
        val nv = rs.size.toLong
        val fl = ds.map(_._2).sum
        (label, nv, ds.map(_._1).sum, fl,
          ds.count(d => d._3 == 1L && d._1 == 0L).toLong,
          if (nv == 0) -1L else 1000L * fl / nv)
      }
    assert(out.toSeq == expect,
      s"engine ${out.toSeq} != brute $expect")
    graft.Caches.releaseAll(spark)
  }

  test("directory-layout fixtures stream their rows (the clone10 staging hole)") {
    // CloneFixture writes tables as Spark part-file DIRECTORIES; the
    // staging used to Files.copy the directory — an EMPTY landing, a
    // zero-row stream, and a silently wrong (fast) census. Pin:
    // directory layout ≡ single-file layout, and nonzero traffic.
    import spark.implicits._
    val single = writeEmb(fixture)
    val dirLayout = java.nio.file.Files.createTempDirectory("embdecond").toString
    fixture.toDF("vec_id", "embedding", "label")
      .repartition(3) // several part files, like CloneFixture output
      .write.parquet(s"$dirLayout/embeddings.parquet")
    val a = q215.run(spark, single).collect().map(_.toString).sorted.toSeq
    val b = q215.run(spark, dirLayout).collect().map(_.toString).sorted.toSeq
    assert(a == b, s"single-file $a != directory $b")
    assert(q215.run(spark, dirLayout).agg(sum("n_vecs")).head.getLong(0) == 6L)
    graft.Caches.releaseAll(spark)
  }

  test("decisions are batching-invariant: 1-batch == 3-batch chunkings") {
    import spark.implicits._
    val dir = writeEmb(fixture)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 20 =!= 0)
    val dim = graft.llm.LlmVector.embDim(emb)
    val bench = EmbDeconGate.bench(spark, dir, dim)
    val whole = EmbDeconGate.decide(emb, bench, dim).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
    val chunked = Seq(0, 1, 2).flatMap { i =>
      EmbDeconGate.decide(emb.filter(col("vec_id") % 3 === i), bench, dim)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.sorted
    assert(whole.toSeq == chunked.toSeq)
  }

  test("sampled audit mode: gate identical; n_missed is EXACTLY full-missed ∩ sample") {
    // Adversarial pair found by seeded search over the REAL md5-parity
    // sign matrix: cos 0.58 (exact hit, well above θ = 0.45) but SRP
    // hamming 11 > HamCut — a genuine sketch miss, so the audit has
    // something to catch. Six clones of the missed arrival give the
    // deterministic 1-in-2 Knuth-hash sample both members and
    // non-members ({3,4,5} of 1..6 — StreamSample.hashOf parity).
    val missA = Seq(0.106f, -0.746f, -0.072f, 0.509f, 0.31f, -1.426f, 1.115f, 1.206f)
    val benchB = Seq(-0.053f, 0.418f, 1.431f, 0.717f, 0.081f, -1.033f, 1.875f, 0.174f)
    val nearB = benchB.map(x => x * 0.99f) // cand + hit -> flagged in any mode
    val clean = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f) // dq < 0 vs bench -> clean
    val rows: Seq[(Long, Seq[Float], Int)] =
      Seq((0L, benchB, 0)) ++ (1L to 6L).map(i => (i, missA, 0)) ++
        Seq((7L, nearB, 0), (8L, clean, 0))
    val dir = writeEmb(rows)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 20 =!= 0)
    val dim = 8
    val bench = EmbDeconGate.bench(spark, dir, dim)
    def dec(auditEvery: Option[Long]) =
      EmbDeconGate.decide(emb, bench, dim, auditEvery).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
    val m = 2L
    val full = dec(None)
    val samp = dec(Some(m))
    // the adversary really is a sketch miss in the full audit
    assert(full.filter(t => t._4 == 1L && t._2 == 0L).map(_._1) == (1L to 6L),
      s"full audit must miss exactly the six clones: $full")
    assert(full.find(_._1 == 7L).get._3 == 1L, "near-copy must still flag")
    // THE GATE IS IDENTICAL: cand and flagged agree row-for-row
    assert(full.map(t => (t._1, t._2, t._3)) == samp.map(t => (t._1, t._2, t._3)),
      s"sampled mode changed a gate decision:\n$full\n$samp")
    // the audit column: sampled-or-candidate rows agree with the full
    // audit; unsampled non-candidates are not audited at all
    val sampled = (1L to 8L).filter(i => StreamSample.hashOf(i) % m == 0).toSet
    assert(sampled.intersect((1L to 6L).toSet).nonEmpty &&
      !(1L to 6L).forall(sampled), s"degenerate sample $sampled")
    samp.foreach { case (id, cand, _, hit) =>
      val fullHit = full.find(_._1 == id).get._4
      if (sampled(id) || cand == 1L) assert(hit == fullHit, s"id $id audit drifted")
      else assert(hit == 0L, s"unsampled non-candidate $id must not audit")
    }
    // census law: sampled n_missed == |full missed ∩ sample| — an
    // exact subset bound, not an estimate
    val fullMissed = full.filter(t => t._4 == 1L && t._2 == 0L).map(_._1).toSet
    val sampMissed = EmbDeconGate.census(
        EmbDeconGate.decide(emb, bench, dim, Some(m)))
      .agg(sum("n_missed")).head.getLong(0)
    assert(sampMissed == fullMissed.count(sampled).toLong,
      s"sampled n_missed $sampMissed != ${fullMissed.count(sampled)}")
  }

  test("driver fixture census obeys the counting laws") {
    val rows = q215.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, nc, nf, nm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nf <= nc && nc <= nv, s"flag/cand/vec law broken: $r")
      assert(nm >= 0 && nm <= nv - nc, s"missed law broken: $r")
      assert(r.getLong(5) == 1000L * nf / nv, s"milli law broken: $r")
    }
    graft.Caches.releaseAll(spark)
  }
}
