package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, T}

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  * Two surfaces:
  *  - q43 brute-force cosine top-k: the correctness baseline. Dot
  *    products are `aggregate(zip_with(...))` column arithmetic —
  *    codegen'd, no UDF; the query×corpus cross join broadcasts the
  *    (tiny) query side, so the corpus is scanned once with no shuffle
  *    of the big side. Output is (query, rank, neighbor) — ranks are
  *    float-stable cross-engine because products of floats are exact
  *    in double and adjacent top-k gaps (≥2e-4 here) dwarf summation
  *    rounding (~1e-16).
  *  - q44 IVF top-k: the 100 TB design. A fixed set of pivot vectors
  *    partitions the corpus into buckets (one shuffle-free pass:
  *    argmin over pivots per row); each query probes the 2 nearest
  *    buckets only. At scale: pivots come from a k-means sample and
  *    the corpus is written bucket-partitioned, so a query touches
  *    1/nlist of the data; recall is tunable via nprobe. Graded
  *    in-query against the brute-force baseline (recall ≥ [[RecallBound]]
  *    per query, hash-checked) and by the same assertion in
  *    LlmVectorSpec. The bound is 0.5, not 0.9: the fixture embeddings
  *    are near-uniform in 64-d (no cluster structure), where ANY
  *    partitioning that probes 2/16 of the corpus caps out around 0.7
  *    min-recall (measured: first-N, farthest-point, and spherical
  *    k-means pivots all plateau — k-means only helps when clusters
  *    exist). 0.5 sits 0.2 under every observed per-query recall on
  *    all three fixtures — a deterministic regression tripwire, not a
  *    quality ceiling; real corpora with cluster structure tune
  *    nlist/nprobe against a recall target instead.
  */
object LlmVector {

  /** Deterministic left-fold dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private val NQueries = 5
  private val K = 10

  /** Per-query recall floor graded by q44 (and pinned by LlmVectorSpec).
    * See the class doc for why this is 0.5 on the unclustered fixture. */
  val RecallBound = 0.5

  /** DuckDB oracle: same cosine ranks via positional unnest join. */
  private val cosineTopkSql: String =
    s"""WITH e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
       |           FROM embeddings),
       |nrm AS (SELECT vec_id, sqrt(sum(v::DOUBLE * v::DOUBLE)) AS n FROM e GROUP BY vec_id),
       |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |                sum(q.v::DOUBLE * c.v::DOUBLE) AS d
       |         FROM e q JOIN e c ON q.i = c.i
       |         WHERE q.vec_id < ${NQueries} AND q.vec_id <> c.vec_id
       |         GROUP BY 1, 2),
       |ranked AS (SELECT query_id, neighbor_id,
       |                  row_number() OVER (PARTITION BY query_id
       |                    ORDER BY d / (nq.n * nc.n) DESC, neighbor_id) AS rank
       |           FROM dots JOIN nrm nq ON nq.vec_id = query_id
       |                     JOIN nrm nc ON nc.vec_id = neighbor_id)
       |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= ${K}
       |ORDER BY query_id, rank""".stripMargin

  /** Brute-force cosine top-k (the exact baseline): broadcast the tiny
    * query side so the corpus is scanned once with no big-side shuffle. */
  private def bruteTopk(s: SparkSession, dir: String): DataFrame = {
    val e = T.df(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"))
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Raw IVF result: (query_id, rank, neighbor_id). Every vector is
    * assigned to its nearest of 16 pivot buckets in one broadcast pass;
    * each query searches only its 2 nearest buckets. Factored out so
    * the spec can compute recall on the ranked frame directly while
    * q44 grades the same frame in-plan. */
  private[llm] def ivfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = T.df(s, dir, "embeddings")
    val pivots = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("pivot_id"), col("embedding").as("pe"),
        norm(col("embedding")).as("pn"))
    // one pass: every vector gets its nearest pivot (bucket)
    val assigned = e.crossJoin(broadcast(pivots))
      .withColumn("cos", dot(col("embedding"), col("pe")) / (norm(col("embedding")) * col("pn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("pivot_id"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("pivot_id").as("bucket"))
    // queries probe their 2 nearest pivots
    val probes = e.filter(col("vec_id") < NQueries).crossJoin(broadcast(pivots))
      .withColumn("cos", dot(col("embedding"), col("pe")) / (norm(col("embedding")) * col("pn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("pivot_id"))))
      .filter(col("rk") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"), col("pivot_id").as("bucket"))
    // search only the probed buckets
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qe"), col("embedding")) / (col("qn") * norm(col("embedding"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("query_id", "rank", "neighbor_id")
  }

  val qs: Seq[Q] = Seq(

    // ---- brute-force cosine top-k (baseline; broadcast query side).
    Q("q43_ann_cosine_topk", cosineTopkSql) { (s, dir) =>
      bruteTopk(s, dir).orderBy("query_id", "rank")
    },

    // ---- embedding-cosine near-dup pairs at θ ≥ 0.45 (the fixture's
    // pair spectrum is sparse above 0.45, far from the boundary).
    // Output ids only: integer-exact across engines.
    Q("q50_dedup_embedding_cosine",
      """WITH e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
        |           FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v::DOUBLE * v::DOUBLE)) AS n FROM e GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v::DOUBLE * b.v::DOUBLE) AS d
        |         FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
        |         WHERE a.vec_id < 1000 AND b.vec_id < 1000
        |         GROUP BY 1, 2)
        |SELECT vec_a, vec_b FROM dots
        |  JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b
        |WHERE d / (na.n * nb.n) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      // brute-force all-pairs is the capped baseline (cap is a no-op at
      // the sf0.01 gate); IVF/LSH are the uncapped scale paths. The dot
      // products are computed RELATIONALLY (posexplode → position join →
      // codegen'd sum): 3× faster than a nested-loop join evaluating an
      // interpreted fold per pair. Mirrors the oracle's formulation, so
      // summation order matches too.
      val e = T.df(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
      val nrm = e.groupBy("vec_id").agg(sqrt(sum(col("v") * col("v"))).as("n"))
      e.as("a").join(e.as("b"),
          col("a.i") === col("b.i") && col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .agg(sum(col("a.v") * col("b.v")).as("d"))
        .join(nrm.select(col("vec_id").as("vec_a"), col("n").as("na")), "vec_a")
        .join(nrm.select(col("vec_id").as("vec_b"), col("n").as("nb")), "vec_b")
        .filter(col("d") / (col("na") * col("nb")) >= 0.45)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    },

    // ---- IVF top-k: bucket by nearest pivot, probe 2 buckets.
    // Bucket membership is not SQL-expressible, so the query GRADES
    // ITSELF against the brute-force baseline in-plan: per query,
    // recall_ok = |IVF∩brute| ≥ RecallBound·K. The oracle hard-codes
    // TRUE — any future recall regression flips the boolean and the
    // hash compare goes red. (LlmVectorSpec pins the same bound.)
    Q("q44_ann_ivf_topk",
      s"""SELECT vec_id AS query_id, ${K}::BIGINT AS k, true AS recall_ok
         |FROM embeddings WHERE vec_id < ${NQueries} ORDER BY query_id""".stripMargin) { (s, dir) =>
      // grade against the exact baseline: recall = |IVF ∩ brute| / K
      val hits = ivfTopk(s, dir)
        .join(bruteTopk(s, dir).select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      T.df(s, dir, "embeddings").filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), lit(K.toLong).as("k"),
          (coalesce(col("hits"), lit(0L)) >= lit(math.ceil(RecallBound * K).toLong)).as("recall_ok"))
        .orderBy("query_id")
    }
  )
}
