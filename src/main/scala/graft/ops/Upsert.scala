package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators a production pipeline runs between queries:
  * MERGE-style upsert and SCD2 (slowly-changing-dimension) history builds.
  * Beyond-reference additions (the reference has no mutable-table story
  * beyond MutableBag's keyed point updates, api/MutableBag.scala:26-44);
  * both are single-shuffle relational plans, not row-at-a-time mutation.
  */
object Upsert {

  /** MERGE INTO target USING source ON keys
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
    * as one full-outer join on the key columns: matched rows take the source
    * version wholesale, unmatched target rows survive, unmatched source rows
    * insert. Both inputs must share the target's schema.
    *
    * Scale: one hash-partitioned shuffle on the key for each side — the same
    * cost Delta/Iceberg pay for a non-file-pruned MERGE. If `source` is a
    * small delta, wrap it in `broadcast()` at the call site and the target
    * side never shuffles.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(target.columns.toSet.subsetOf(source.columns.toSet),
      s"source is missing target columns: " +
        (target.columns.toSet -- source.columns.toSet).mkString(", "))
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    // a presence MARKER, not key-null checks: the join condition is null-SAFE
    // (<=>), so a NULL key can legitimately match — inspecting source key
    // columns would misread that match as "unmatched" and drop the update
    val t = target.as("t")
    val s = source.withColumn("__graft_src", lit(true)).as("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val matched = col("s.__graft_src").isNotNull
    t.join(s, cond, "full_outer").select(
      keys.map(k => when(matched, col(s"s.$k")).otherwise(col(s"t.$k")).as(k)) ++
        dataCols.map(c => when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }

  /** SCD2 history: collapse a keyed, timestamped attribute stream into
    * validity intervals — consecutive runs of the same attribute value per
    * key become one row `(key, attr, valid_from, valid_to)`, with
    * `valid_to = NULL` for the current (open) version.
    *
    * Three window passes over ONE partitioning (key) — Catalyst plans a
    * single shuffle + sort reused by all of them — then one aggregate:
    * change-point marking (lag), run numbering (running sum), and the next
    * run's start as this run's end (lead over the aggregated runs).
    * `orderCols` must make the order within a key total (pass a unique
    * tiebreaker column after the timestamp) or run boundaries at ties are
    * nondeterministic.
    */
  def scd2(events: DataFrame, key: String, attr: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scd2 needs at least one ordering column")
    val w = Window.partitionBy(key).orderBy(orderCols.map(col): _*)
    val ts = col(orderCols.head)
    val changed = when(lag(col(attr), 1).over(w) <=> col(attr), 0).otherwise(1)
    val runs = events
      .withColumn("__run", sum(changed).over(w))
      .groupBy(col(key), col("__run"))
      .agg(first(col(attr)).as(attr), min(ts).as("valid_from"))
    val wr = Window.partitionBy(key).orderBy(col("valid_from"), col("__run"))
    runs.select(col(key), col(attr), col("valid_from"),
      lead(col("valid_from"), 1).over(wr).as("valid_to"))
  }
}
