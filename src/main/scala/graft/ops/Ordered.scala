package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-based operators Spark has no built-in for: gaps-and-islands
  * interval merging and the 2-D Pareto frontier (skyline).
  *
  * Scale notes (100 TB): `mergeIntervals` is one shuffle on the key plus an
  * in-partition sort; both window frames share the same partitioning and
  * ordering, so Catalyst plans a single Sort + Window pair. `skyline2D`'s
  * final pass is a global sort (single reducer by nature of the problem),
  * but the LOCAL pre-filter pass runs per input partition first and a
  * skyline is typically tiny relative to its input — a global-skyline point
  * can never be dominated inside any subset, so the local pass is lossless
  * while shrinking the global pass's input by orders of magnitude.
  */
object Ordered {

  /** Merge overlapping-or-touching [start, end] intervals per key.
    * A new island starts when an interval's start exceeds the running max
    * end of everything before it (sorted by start, then end). Returns one
    * row per merged island: key, island bounds, contained interval count.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMaxEnd =
      max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland =
      when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1).otherwise(0)
    df.withColumn("__new", newIsland)
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(startCol).as("island_start"), max(endCol).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Points NOT strictly dominated within `part` (maximize both x and y):
    * keep a row iff its y beats every y at strictly greater x AND equals the
    * max y among ties on x. Exact duplicates are all kept (neither strictly
    * dominates the other) — same semantics as the NOT EXISTS formulation.
    */
  private def localMaxima(df: DataFrame, part: Seq[Column], xCol: String,
      yCol: String): DataFrame = {
    val wGt = Window.partitionBy(part: _*).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(part :+ col(xCol): _*)
    df.withColumn("__mg", max(col(yCol)).over(wGt))
      .withColumn("__me", max(col(yCol)).over(wEq))
      .where((col("__mg").isNull || col(yCol) > col("__mg")) &&
        col(yCol) === col("__me"))
      .drop("__mg", "__me")
  }

  /** 2-D skyline / Pareto frontier, maximizing both `xCol` (orderable with
    * meaningful range offsets — integer/long/date) and `yCol`. Two-phase:
    * a per-bucket local skyline (distributed, lossless pre-filter), then the
    * exact global pass over the survivors.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val local = localMaxima(
      df.withColumn("__b", pmod(xxhash64(col(xCol), col(yCol)), lit(buckets))),
      Seq(col("__b")), xCol, yCol).drop("__b")
    localMaxima(local, Seq.empty, xCol, yCol)
  }
}
