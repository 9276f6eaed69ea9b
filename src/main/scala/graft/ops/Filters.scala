package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Removal attribution for a quality-filter cascade — the report every
  * production curation pipeline publishes next to its output corpus
  * (CCNet/Gopher/RefinedWeb-style "what did each filter cost us").
  *
  * Spark-first design: the cascade is ONE nested `when` expression over the
  * scan (whole-stage codegen, no per-filter pass, no UDF), and the report is
  * a single tiny aggregation over the attributed label. At 100 TB this is
  * exactly one read of the corpus and a K-row shuffle — adding a filter to
  * the cascade changes the expression, not the pass count. The same
  * attribution column doubles as the keep-predicate (`kept`) so report and
  * filtered corpus come from one scan via `attributed`.
  */
object Filters {

  val KeptLabel = "kept"

  /** Column holding the cascade verdict: the name of the FIRST filter a row
    * fails, or [[KeptLabel]] if it passes all of them. A filter's predicate
    * is its KEEP condition; a null predicate result counts as a failure
    * (null-valued quality signals mean "could not establish quality", and a
    * cascade that silently keeps such rows under-reports removals).
    */
  def attributed(filters: Seq[(String, Column)]): Column = {
    require(filters.nonEmpty, "filterReport needs at least one filter")
    filters.foldRight(lit(KeptLabel)) { case ((name, keep), rest) =>
      when(!coalesce(keep.cast("boolean"), lit(false)), lit(name)).otherwise(rest)
    }
  }

  /** One row per filter IN CASCADE ORDER plus the [[KeptLabel]] sentinel:
    * (filter, n) where n is the number of rows removed by that filter (for
    * the sentinel: the survivor count). Filters that removed nothing still
    * appear with n = 0 — a report whose rows depend on the data can't be
    * diffed across corpus versions.
    */
  def filterReport(df: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    val counts = df
      .select(attributed(filters).as("filter"))
      .groupBy("filter").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val dim = (filters.map(_._1) :+ KeptLabel).toDF("filter")
    // both sides are K rows; the hint must go on the RIGHT (non-preserved)
    // side — Spark cannot build a left-outer join from its preserved side,
    // so broadcast(dim) would be a dead hint (HintErrorLogger)
    dim.join(broadcast(counts), Seq("filter"), "left")
      .select(col("filter"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** The corpus the cascade keeps — same expression, same single scan. */
  def applyCascade(df: DataFrame, filters: Seq[(String, Column)]): DataFrame =
    df.where(attributed(filters) === KeptLabel)
}
