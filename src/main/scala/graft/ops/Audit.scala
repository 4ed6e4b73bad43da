package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, T}

/** Data-quality auditing over the relational star schema — the
  * referential-integrity pass a pipeline runs before trusting a drop:
  * for every declared FK edge, how many child rows point at a missing
  * parent. A healthy TPC-H-shaped fixture audits to zero orphans on
  * every edge, which is exactly what the oracle pins; FkAuditSpec
  * drives the same operator over a synthetic star with INJECTED
  * orphans to prove the detection side (an all-zero fixture cannot).
  *
  * Shape per edge: child LEFT JOIN parent key, one conditional
  * aggregate — n_child and n_orphan in a single pass over the child
  * (an anti-join would need a second pass for the total). Plan at
  * 100 TB: each parent key column is dimension-sized relative to its
  * child and broadcasts (orders⋈lineitem is the one genuinely large
  * parent — AQE falls back to a shuffle join on the shared key, no
  * plan cliff); the four edges are independent subtrees unioned at
  * 4 rows. PlanSpec pins no-cartesian/no-BNLJ + conditional-agg
  * partials.
  */
object Audit {

  /** (fk label, child frame keyed `k`, parent frame keyed `pk`). */
  private def edges(s: SparkSession, dir: String): Seq[(String, DataFrame, DataFrame)] = {
    def t(n: String) = T.df(s, dir, n)
    Seq(
      ("lineitem.l_orderkey->orders",
        t("lineitem").select(col("l_orderkey").as("k")),
        t("orders").select(col("o_orderkey").as("pk"))),
      ("lineitem.l_partkey->part",
        t("lineitem").select(col("l_partkey").as("k")),
        t("part").select(col("p_partkey").as("pk"))),
      ("lineitem.l_suppkey->supplier",
        t("lineitem").select(col("l_suppkey").as("k")),
        t("supplier").select(col("s_suppkey").as("pk"))),
      ("orders.o_custkey->customer",
        t("orders").select(col("o_custkey").as("k")),
        t("customer").select(col("c_custkey").as("pk"))))
  }

  /** One audit row per FK edge: (fk, n_child, n_orphan). The parent
    * key side is DISTINCT'd before the join: a parent with a
    * duplicated primary key would otherwise amplify child rows and
    * corrupt both counts silently (the oracle omits the distinct
    * because fixture PKs are unique — same result; FkAuditSpec pins
    * the dup-parent guard on a synthetic star). */
  private[graft] def audit(edges: Seq[(String, DataFrame, DataFrame)]): DataFrame =
    edges.map { case (label, child, parent) =>
      child.join(parent.distinct(), col("k") === col("pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphan"))
        .select(lit(label).as("fk"), col("n_child"), col("n_orphan"))
    }.reduce(_ union _)

  /** Block-fingerprint diff of two snapshots (the rsync idea applied
    * to tables): aggregate an order-independent integer fingerprint
    * per id-range block on each side, then compare ONLY the block
    * summaries — the full-outer diff of two 100 TB tables exchanges
    * |blocks| rows, never data rows (both per-block aggregates
    * pre-combine map-side). A block differs if its row count or
    * fingerprint sum differs; the caller then re-syncs just those
    * blocks. The row fingerprint must be ENGINE-PORTABLE integer
    * arithmetic (a polynomial mod a prime — built-in hash() differs
    * per engine) and the block fold ORDER-INDEPENDENT (sum), so
    * partition order never matters. Collision risk is the standard
    * fingerprinting trade: a block-level false negative needs fp sums
    * to collide at equal counts (~1/1e9 per block); production stacks
    * a second independent polynomial. */
  private[graft] def blockDiff(a: DataFrame, b: DataFrame): DataFrame = {
    def fps(df: DataFrame, n: String, f: String) =
      df.groupBy("block_id")
        .agg(count(lit(1)).as(n), sum(col("fp")).as(f))
    fps(a, "n_a", "fp_a").join(fps(b, "n_b", "fp_b"), Seq("block_id"), "full_outer")
      .select(col("block_id"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("fp_a"), lit(0L)).as("fp_a"),
        coalesce(col("fp_b"), lit(0L)).as("fp_b"))
      .filter(col("n_a") =!= col("n_b") || col("fp_a") =!= col("fp_b"))
      .orderBy("block_id")
  }

  val qs: Seq[Q] = Seq(
    Q("q118_fk_audit",
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk, count(*)::BIGINT AS n_child,
        |         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphan
        |  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', count(*)::BIGINT,
        |         sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |  FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier', count(*)::BIGINT,
        |         sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |  FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', count(*)::BIGINT,
        |         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        |) ORDER BY fk""".stripMargin) { (s, dir) =>
      audit(edges(s, dir)).orderBy("fk")
    },

    // ---- snapshot diff by block fingerprint ([[blockDiff]]): the
    // fixture's "replica" is the same table with every 97th doc
    // deterministically dropped — the diff must name exactly the
    // blocks containing a dropped doc, with both sides' counts and
    // fingerprint sums for the re-sync decision. PlanSpec pins that
    // only block summaries reach the join (both sides carry partial
    // aggs) and the join stays on the block key.
    Q("q120_block_diff",
      """WITH a AS (SELECT doc_id // 64 AS block_id,
        |                  ((doc_id * 1000003 + n_chars * 10007 + length(text)) % 1000000007) AS fp
        |           FROM documents),
        |b AS (SELECT doc_id // 64 AS block_id,
        |             ((doc_id * 1000003 + n_chars * 10007 + length(text)) % 1000000007) AS fp
        |      FROM documents WHERE doc_id % 97 != 0),
        |fa AS (SELECT block_id, count(*)::BIGINT AS n_a, sum(fp)::BIGINT AS fp_a FROM a GROUP BY 1),
        |fb AS (SELECT block_id, count(*)::BIGINT AS n_b, sum(fp)::BIGINT AS fp_b FROM b GROUP BY 1)
        |SELECT coalesce(fa.block_id, fb.block_id) AS block_id,
        |       coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        |       coalesce(fp_a, 0) AS fp_a, coalesce(fp_b, 0) AS fp_b
        |FROM fa FULL OUTER JOIN fb ON fa.block_id = fb.block_id
        |WHERE fp_a IS DISTINCT FROM fp_b OR n_a IS DISTINCT FROM n_b
        |ORDER BY block_id""".stripMargin) { (s, dir) =>
      def keyed(df: DataFrame) = df.select(
        expr("doc_id div 64").as("block_id"),
        ((col("doc_id") * 1000003L + col("n_chars") * 10007L + length(col("text")))
          % 1000000007L).as("fp"))
      val base = T.df(s, dir, "documents")
      blockDiff(keyed(base), keyed(base.filter(col("doc_id") % 97 =!= 0)))
    }
  )
}
