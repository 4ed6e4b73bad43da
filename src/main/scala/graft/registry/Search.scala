package graft.registry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's query layer (toexcel.py) re-expressed Spark-first.
  *
  * - User WHERE text per table goes through Catalyst's SQL parser via
  *   `expr()` (toexcel.py:29 interpolates it into raw SQL — same
  *   power, minus the SQL injection).
  * - The per-table id-set intersection (toexcel.py:109-115) becomes a
  *   LEFT SEMI join chain — no driver-side sets; Catalyst broadcasts
  *   the small hit sets.
  * - The per-trial N+1 point lookups + string aggregation
  *   (toexcel.py:133-161) become pure array expressions over the merged
  *   frame's nested child collections — ZERO joins in the export
  *   projection, because the single groupBy already co-located each
  *   trial's children with its row.
  */
object Search {

  /** Per-table optional WHERE clauses. None = don't constrain on that
    * table (toexcel.py:25-28: empty input on a child table means skip;
    * empty on trial means all trials). */
  final case class Query(
      trial: Option[String] = None,
      imp: Option[String] = None,
      sponsor: Option[String] = None,
      location: Option[String] = None)

  /** Selected trial ids as a semi-join chain over the searched tables. */
  def search(t: RegistryTables, q: Query): DataFrame = {
    var hits = t.trials.where(expr(q.trial.getOrElse("1=1")))
    def narrow(child: DataFrame, pred: Option[String]): Unit = pred.foreach { p =>
      hits = hits.join(
        child.where(expr(p)).select("eudract_id"), Seq("eudract_id"), "left_semi")
    }
    narrow(t.imp, q.imp)
    narrow(t.sponsor, q.sponsor)
    narrow(t.location, q.location)
    hits.select("eudract_id")
  }

  /** Preferred IMP display name: product > trade > code, emitted as
    * "label:value" (toexcel.py:142-149). */
  private def impLabel(i: Column): Column =
    when(i.getField("product").isNotNull, concat(lit("product:"), i.getField("product")))
      .when(i.getField("trade").isNotNull, concat(lit("trade:"), i.getField("trade")))
      .otherwise(concat(lit("code:"), coalesce(i.getField("code"), lit(""))))

  /** One export row per selected trial (toexcel.py:126-162): the trial
    * projection plus the three condensed child columns. The reference's
    * sponsor cell takes an arbitrary "first" row (set iteration order,
    * crashes when empty — toexcel.py:155-157); engine pins
    * first-occurrence order and yields null (SURVEY §7.4.4c). */
  def export(t: RegistryTables, q: Query, trialCols: Seq[String]): DataFrame = {
    val ids = search(t, q)
    t.merged
      .join(ids, Seq("eudract_id"), "left_semi")
      .select(
        (col("eudract_id") +: trialCols.map(col)) :+
          array_join(transform(col("imps"), impLabel(_)), "; ").as("imp_entry") :+
          array_join(col("locations"), ", ").as("location_entry") :+
          try_element_at(col("sponsors"), lit(1)).getField("name").as("sponsor_entry"): _*)
      .orderBy("eudract_id") // toexcel.py:133 sorted(final_set)
  }
}
