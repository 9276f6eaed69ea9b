package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: put a keyed, irregular event series onto a
  * fixed tick grid with forward fill. Beyond-reference addition — the
  * standard preprocessing step before any windowed feature extraction or
  * as-of joining of sensor/market/metrics data.
  *
  * Everything stays in-plan: per-key spans (one aggregation), the tick grid
  * via `sequence` + `explode` (no driver loop), per-tick last observation
  * (one window), and the forward fill (one more window over the SAME key
  * partitioning, so Catalyst reuses the shuffle). Grid size is
  * span/step per key — pick `stepUs` so a key's grid stays O(10⁴-10⁶) rows;
  * the explode is distributed, so total grid volume is the only limit.
  */
object Resample {

  /** One row per `stepUs` tick per key, from the key's first observed tick
    * to its last, carrying the latest observation at-or-before each tick
    * (`valCol` forward-filled; ticks before the first observation cannot
    * occur by construction). `tieCol` breaks ties among observations in the
    * same microsecond — pass a unique id to make the kept row total-ordered.
    * Timestamps must be NON-NEGATIVE: `div` truncates toward zero (as does
    * DuckDB's integer `//` — measured -7//2 = -3 — but a genuinely
    * flooring engine would differ), and truncation makes the bucket at 0
    * twice as wide as every other when inputs straddle it. Epoch
    * micros/positions satisfy the contract naturally.
    */
  def resampleFfill(df: DataFrame, key: String, tsUsCol: String,
      valCol: String, tieCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val obs = df.select(col(key), expr(s"$tsUsCol div $stepUs").as("tick"),
      col(tsUsCol), col(valCol), col(tieCol))
    // latest observation within each tick
    val wLast = Window.partitionBy(col(key), col("tick"))
      .orderBy(col(tsUsCol).desc, col(tieCol).desc)
    val tickVals = obs.withColumn("__rn", row_number().over(wLast))
      .where(col("__rn") === 1).select(col(key), col("tick"), col(valCol))
    val grid = tickVals.groupBy(col(key))
      .agg(min("tick").as("t0"), max("tick").as("t1"))
      .select(col(key), explode(sequence(col("t0"), col("t1"))).as("tick"))
    val wFill = Window.partitionBy(col(key)).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(tickVals, Seq(key, "tick"), "left")
      .select(col(key), col("tick"),
        last(col(valCol), ignoreNulls = true).over(wFill).as(valCol))
  }
}
