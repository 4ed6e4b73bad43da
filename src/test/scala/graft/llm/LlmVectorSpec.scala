package graft.llm

import graft.SparkSpec

/** Properties of the similarity-search operators that the SQL oracle
  * cannot express: LSH recall vs the brute-force baseline and IVF
  * recall/determinism. */
class LlmVectorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF top-k: every query returns k ranked neighbors, recall@10 >= RecallBound vs brute force") {
    val brute = LlmVector.qs.find(_.name == "q43_ann_cosine_topk").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ivf = LlmVector.ivfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(ivf.keys.toSet == brute.keys.toSet)
    val recalls = ivf.map { case (q, neighbors) =>
      assert(neighbors.size == 10, s"query $q returned ${neighbors.size} neighbors")
      val recall = (neighbors & brute(q)).size / 10.0
      assert(recall >= LlmVector.RecallBound, s"query $q recall $recall below ${LlmVector.RecallBound}")
      recall
    }
    // the measured plateau, not just the per-query floor: a regression
    // inside the [RecallBound, plateau) dead zone must stay visible
    // (ADVICE r4). nprobe=3 k-means pivots measure mean 0.80 here.
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall $mean fell below the measured ~0.8 plateau")
    // the graded query agrees: recall_ok is true for every query
    val graded = LlmVector.qs.find(_.name == "q44_ann_ivf_topk").get
      .run(spark, dir).collect()
    assert(graded.length == brute.keys.size)
    graded.foreach(r => assert(r.getBoolean(2), s"query ${r.getLong(0)} recall_ok=false"))
  }

  test("IVF is deterministic across runs") {
    val q = LlmVector.qs.find(_.name == "q44_ann_ivf_topk").get
    val a = q.run(spark, dir).collect().toSeq
    val b = q.run(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("LSH near-dup pairs equal the brute-force baseline at this scale") {
    val brute = LlmText.qs.find(_.name == "q39_dedup_ngram_jaccard").get
      .run(spark, dir).collect().map(_.toSeq).toSet
    val lsh = LlmText.qs.find(_.name == "q41_dedup_minhash_lsh").get
      .run(spark, dir).collect().map(_.toSeq).toSet
    assert(lsh == brute, s"LSH found ${lsh.size} pairs, brute force ${brute.size}")
  }

  test("dropNearDuplicates keeps exactly one representative per near-dup cluster") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = LlmText.qs.find(_.name == "q39_dedup_ngram_jaccard").get.run(spark, dir)
    val comps = Dedup.components(pairs, "doc_a", "doc_b").collect()
    val clusters = comps.map(_.getLong(1)).distinct.length
    val members = comps.length
    val survivors = Dedup.dropNearDuplicates(docs, "doc_id", pairs, "doc_a", "doc_b")
    assert(survivors.count() == docs.count() - (members - clusters))
    // every representative survived; every non-representative is gone
    val kept = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    comps.foreach { r =>
      val (id, rep) = (r.getLong(0), r.getLong(1))
      assert(kept(id) == (id == rep), s"doc $id rep $rep kept=${kept(id)}")
    }
  }

  test("vocab-cap shuffle-join fallback produces the same token hashes as the broadcast path") {
    // cap 0 forces the open-vocabulary path (no broadcast hint); the
    // dictionary-join result must be identical either way
    val (bPlan, bDict) = LlmText.tokenHashArrPlan(spark, dir, Long.MaxValue)
    val (sPlan, sDict) = LlmText.tokenHashArrPlan(spark, dir, 0L)
    try {
      val b = bPlan.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val s = sPlan.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(b.nonEmpty && b == s)
    } finally { bDict.unpersist(); sDict.unpersist() }
  }

  test("bucketed IVF index write: partition pruning reads only probed buckets") {
    val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index"
    LlmVector.writeBucketedIndex(spark, dir, out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(dirs.nonEmpty && dirs.length <= 16)
    // a single-bucket probe plans a pruned scan: only that partition's files
    val pruned = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"), s"no partition pruning:\n$plan")
    // round-trips the full corpus
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(s"$dir/embeddings.parquet").count())
  }

  test("PQ ADC: deterministic codebooks, recall@10 >= PqRecallBound vs brute force") {
    val brute = LlmVector.qs.find(_.name == "q43_ann_cosine_topk").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // codebooks deterministic across cache drops
    val b1 = LlmVector.pqCodebooks(spark, dir).map(_.map(_.toSeq).toSeq).toSeq
    LlmVector.release(spark)
    val b2 = LlmVector.pqCodebooks(spark, dir).map(_.map(_.toSeq).toSeq).toSeq
    assert(b1 == b2, "PQ codebook fit is not deterministic")
    val pq = LlmVector.pqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(pq.keys.toSet == brute.keys.toSet)
    val recalls = pq.map { case (q, neighbors) =>
      assert(neighbors.size == 10, s"query $q returned ${neighbors.size} neighbors")
      val recall = (neighbors & brute(q)).size / 10.0
      assert(recall >= LlmVector.PqRecallBound,
        s"query $q PQ recall $recall below ${LlmVector.PqRecallBound}")
      recall
    }
    info(s"PQ ADC per-query recalls: ${recalls.toSeq.sorted.mkString(", ")}")
    // the graded query agrees: recall_ok true for every query
    val graded = LlmVector.qs.find(_.name == "q105_pq_adc").get.run(spark, dir).collect()
    assert(graded.length == 5 && graded.forall(_.getBoolean(2)))
  }

  test("multimodal batched decode plumbing: stub frames match the column-arithmetic path") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, "hello world, a longer payload".getBytes("UTF-8"), "text/plain", 29L))
      .toDS()
    val frames = Multimodal.MediaBatch.mapDecoded(media, 3).collect()
    assert(frames.length == 3)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1, 2))
    // frame 0 = bytes [1,9) of "hello world..." = "ello wor"
    assert(frames(0).fragHex == "ello wor".getBytes("UTF-8").map("%02X".format(_)).mkString)
  }

  test("multimodal batched features: short payloads clamp n_used; byte stats unsigned") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, Array[Byte](0x7F, -1, 0x00), "image/png", 3L),
      Multimodal.Media(2L, "0123456789abcdefXYZ".getBytes("UTF-8"), "audio/wav", 19L))
      .toDS()
    val f = Multimodal.MediaBatch.features(media, 16).collect()
      .map(x => x.doc_id -> x).toMap
    // doc 1: 3 bytes < 16 — n_used clamps; 0xFF reads unsigned 255
    assert(f(1L) == Multimodal.MediaFeat(1L, 3, 0x7F + 255 + 0, 255))
    // doc 2: 19 bytes — exactly the first 16 ('0'..'9','a'..'f') count
    assert(f(2L) == Multimodal.MediaFeat(2L, 16,
      "0123456789abcdef".getBytes("UTF-8").map(_ & 0xFF).map(_.toLong).sum, 'f'.toInt))
  }
  test("q73 k-means training really converges: strict objective gain, full assignment") {
    val iters = LlmVector.trainKmeans(spark, dir)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    iters.foreach { case (assigned, obj) =>
      assert(assigned == n, s"$assigned of $n rows assigned")
      assert(obj <= n + 1e-6, s"objective $obj exceeds the cos<=1 bound $n")
    }
    // beyond the oracle's tolerance booleans: Lloyd must actually move
    // on the fixture, not sit at the init within 1e-6
    assert(iters.last._2 > iters.head._2 + 1e-3,
      s"objective flat: ${iters.map(_._2).mkString(", ")}")
    val objs = iters.map(_._2)
    objs.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-6) case _ => }
  }

}
