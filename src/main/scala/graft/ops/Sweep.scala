package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line concurrency: how many intervals are open at each boundary
  * event — max concurrent sessions, peak resource usage, overlap counting.
  * Beyond-reference addition, and the scale answer to a question usually
  * (mis)written as an interval self-join: the sweep is O(n log n) in events,
  * where the self-join is quadratic in overlap.
  *
  * Two-level prefix sums keep it distributed: running sums WITHIN a time
  * bucket are an ordinary partitioned window; the carry-in offset per bucket
  * is a cumulative sum over the (tiny) per-bucket totals relation — the only
  * single-partition window runs over #buckets rows, bounded by time-span /
  * bucketUs, never by data volume. This is the textbook parallel
  * prefix-scan, expressed relationally.
  */
object Sweep {

  /** Per boundary event `(t, delta, conc)`: +1 rows are interval starts
    * (end exclusive: a start at exactly another interval's end does NOT
    * overlap it — ends sort before starts at equal t since -1 < +1).
    * `conc` at a +1 row is the number of open intervals including its own;
    * output is order-invariant under ties because tied rows share a delta.
    *
    * Times must be NON-NEGATIVE (epoch micros, positions): `div` truncates
    * toward zero while floor-division engines (DuckDB `//`) floor, so
    * negative times would bucket differently across engines — same contract
    * as [[RangeJoin.intervalJoin]].
    */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val ev = intervals.select(col(startCol).as("t"), lit(1).as("delta"))
      .unionAll(intervals.select(col(endCol).as("t"), lit(-1).as("delta")))
      .withColumn("bucket", expr(s"t div $bucketUs"))
    val wIn = Window.partitionBy("bucket").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = ev.withColumn("prefix", sum("delta").over(wIn))
    // carry-in per bucket: cumulative total of all PRIOR buckets
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ev.groupBy("bucket").agg(sum("delta").as("btot"))
      .withColumn("offset", coalesce(sum("btot").over(wB), lit(0L)))
      .select("bucket", "offset")
    withPrefix.join(offsets, "bucket")
      .select(col("t"), col("delta"),
        (col("prefix") + col("offset")).as("conc"))
  }
}
