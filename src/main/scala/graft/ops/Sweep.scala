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
  * Three-level prefix sums keep it distributed: running sums WITHIN a time
  * bucket are an ordinary partitioned window; the carry-in offset per bucket
  * is itself a two-level scan (per-bucket totals roll up into super-buckets
  * of [[superFactor]] buckets; only the one-row-per-super-bucket relation
  * crosses the single sorting task, and the within-super distribution is a
  * partitioned window again). Single-task work is #buckets / superFactor
  * rows — bounded by time-span, divided by 2^16, never by data volume. This
  * is the textbook parallel prefix-scan, expressed relationally.
  */
object Sweep {

  /** Per boundary event `(t, delta, conc)`: +1 rows are interval starts
    * (end exclusive: a start at exactly another interval's end does NOT
    * overlap it — ends sort before starts at equal t since -1 < +1).
    * `conc` at a +1 row is the number of open intervals including its own;
    * output is order-invariant under ties because tied rows share a delta.
    *
    * Times must be NON-NEGATIVE (epoch micros, positions): `div` truncates
    * toward zero (as does DuckDB's integer `//` — measured -7//2 = -3 —
    * though a genuinely flooring engine would differ), and truncation
    * folds (-bucket, +bucket) onto bucket 0 so negative times would
    * mis-bucket — same contract as [[RangeJoin.intervalJoin]].
    */
  /** Buckets per super-bucket in the carry-in scan. The only
    * partition-less window in the plan runs over ONE ROW PER SUPER-BUCKET,
    * so its input is `#buckets / superFactor` rows — a year of 1-second
    * buckets (31M) collapses to ~480 rows through the single sorting task,
    * while each distribute-within window handles at most `superFactor`
    * tiny (bucket, total) rows inside its own partition. */
  val superFactor: Long = 1L << 16

  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val ev = intervals.select(col(startCol).as("t"), lit(1).as("delta"))
      .unionAll(intervals.select(col(endCol).as("t"), lit(-1).as("delta")))
      .withColumn("bucket", expr(s"t div $bucketUs"))
    val wIn = Window.partitionBy("bucket").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = ev.withColumn("prefix", sum("delta").over(wIn))
    // carry-in per bucket, two-level so no window ever funnels the
    // per-bucket relation through one task:
    //   1. per-bucket totals, tagged with their super-bucket
    val perBucket = ev.groupBy("bucket").agg(sum("delta").as("btot"))
      .withColumn("sweep_sb", expr(s"bucket div $superFactor"))
    //   2. the tiny global scan: cumulative total of PRIOR super-buckets
    //      (one row per super-bucket — the only partition-less window)
    val wSuper = Window.orderBy("sweep_sb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val superOffsets = perBucket.groupBy("sweep_sb")
      .agg(sum("btot").as("stot"))
      .withColumn("soffset", coalesce(sum("stot").over(wSuper), lit(0L)))
      .select("sweep_sb", "soffset")
    //   3. distribute within each super-bucket: prior-bucket totals under
    //      a PARTITIONED window (≤ superFactor rows per partition)
    val wWithin = Window.partitionBy("sweep_sb").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("inoffset", coalesce(sum("btot").over(wWithin), lit(0L)))
      .join(superOffsets, "sweep_sb")
      .select(col("bucket"), (col("soffset") + col("inoffset")).as("offset"))
    withPrefix.join(offsets, "bucket")
      .select(col("t"), col("delta"),
        (col("prefix") + col("offset")).as("conc"))
  }
}
