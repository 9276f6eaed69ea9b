package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality audit operators — the checks a production pipeline runs
  * before publishing a table. Beyond-reference addition; each audit is a
  * single aggregation or join expressed so the optimizer can fuse it with
  * the producing plan (no row-at-a-time validation pass).
  *
  * Scale notes: `nullRates` and `keyDuplicates` are one map-side-combinable
  * aggregation each; `referentialOrphans` is a left-anti join that
  * broadcasts whenever the parent key set is small, and degrades to one
  * hash-partitioned shuffle otherwise — the same cost the join the audit
  * protects would pay.
  */
object Audit {

  /** Per-column null fraction (one pass, one row):
    * `avg(CASE WHEN col IS NULL THEN 1 ELSE 0 END)` per column — exact
    * rationals k/n, so the doubles are engine-portable. */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      cols.map(c => avg(when(col(c).isNull, 1.0).otherwise(0.0))
        .as(s"nullrate_$c")): _*)

  /** Keys that violate uniqueness, with their multiplicities. */
  def keyDuplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** Child rows whose foreign key has no match in the parent (orphans). */
  def referentialOrphans(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** Schema drift between two table vintages: one row per difference —
    * `(column, change)` with change ∈ {added, removed, type_changed}.
    * Drives the accept/quarantine decision when an upstream delivery's
    * schema moves; purely metadata (no data scan). */
  def schemaDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    // surface duplicate column names explicitly — folding them into a map
    // would silently hide one of the duplicates from the diff
    def dups(df: DataFrame, side: String): Seq[(String, String)] =
      df.schema.map(_.name).groupBy(identity).collect {
        case (c, g) if g.size > 1 => (c, s"duplicate_name:$side")
      }.toSeq.sorted
    val o = old.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = neu.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      dups(old, "old") ++ dups(neu, "new") ++
      (n.keySet -- o.keySet).toSeq.sorted.map(c => (c, "added")) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c => (c, "removed")) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => (c, s"type_changed:${o(c)}->${n(c)}")
      }
    val spark = old.sparkSession
    import spark.implicits._
    rows.toDF("column", "change")
  }

  /** Per-column table profile — the ANALYZE-style statistics pass:
    * `(column, n_rows, n_nulls, n_distinct)`, one output row per column.
    *
    * Everything is computed in ONE aggregation over one scan, then pivoted
    * to long format inside the plan (array-of-structs + explode — no
    * per-column jobs, no driver loop over columns). With `exact = false`
    * (the 100 TB default) distinct counts use HyperLogLog partials and the
    * aggregation stays a single map-side-combinable pass; `exact = true`
    * plans Spark's Expand over the column set (n_cols × rows intermediate —
    * affordable at audit scale, and engine-portable for oracles). */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    // positional aliases (__null_0, __ndv_0, …) — never re-parse user column
    // names, which may contain dots/backticks that col() would misread as
    // struct-field access
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"__null_$i"),
        (if (exact) countDistinct(df(c)) else approx_count_distinct(df(c)))
          .as(s"__ndv_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) => struct(
        lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$i").as("n_nulls"),
        col(s"__ndv_$i").cast("long").as("n_distinct")) }: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"), col("p.n_distinct"))
  }
}
