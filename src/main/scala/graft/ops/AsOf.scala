package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal backward) join — for each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` among rows sharing the
  * join key. The reference has no such operator (its joins are inner
  * equi-joins, SURVEY §2.4); this is a beyond-reference addition for
  * time-series enrichment (trades→quotes, clicks→latest-profile, ...).
  *
  * Spark-first design — the union+window formulation, NOT a range join:
  * tag both sides, union them, and run ONE window sort per key taking the
  * last right row seen at-or-before each left row. Cost = one shuffle on the
  * key plus a per-key sort — the same class as a sort-merge join — and it
  * never materializes the (left × right-rows-before) blow-up a range
  * join/filter would. At 100 TB both inputs shuffle once; heavy keys can be
  * pre-salted by time range if a single key's history exceeds a partition.
  *
  * Determinism: among right rows with equal time, the one with the greatest
  * `(rightTime, payloadCols...)` struct wins (lexicographic) — a total order
  * as long as the payload columns are orderable.
  */
object AsOf {

  /** @param keys       equi-join key columns present on both sides
    * @param leftTime   left ordering column name (orderable, same type family
    *                   as `rightTime`)
    * @param rightTime  right ordering column name
    * @param rightCols  right payload columns to attach (become `prefix+name`)
    * @param prefix     prefix for the attached right columns (incl. the time)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      prefix: String = "r_"): DataFrame = {
    val payload = rightTime +: rightCols
    val rStruct = struct(payload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType

    val lCols = left.columns.toSeq
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    // a null right time has no place on the time axis (it would sort first
    // and wrongly match every later left row) — such rows can never be the
    // "latest at-or-before" anything, so drop them; left rows with null time
    // sort before all right rows and correctly match nothing. Null join keys
    // never match under SQL equi-join semantics, but Window.partitionBy
    // groups nulls together — so drop null-key right rows too; null-key left
    // rows then partition alone and pass through unmatched.
    val rSide = right
      .where(keys.map(k => col(k).isNotNull).reduce(_ && _) && col(rightTime).isNotNull)
      .select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lSide.schema("__l").dataType).as("__l"),
        rStruct.as("__r")): _*)

    // Right rows sort before left rows at equal time (at-or-before semantics);
    // equal-time right rows sort by payload so `last` picks the max struct.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.union(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(n => col(s"__l.$n").as(n)) ++
        payload.map(n => col(s"__m.$n").as(s"$prefix$n")): _*)
  }
}
