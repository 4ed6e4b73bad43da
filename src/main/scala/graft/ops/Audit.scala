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
    }
  )
}
