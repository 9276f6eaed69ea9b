package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a plain (depth, slot, cnt) relation.
  *
  * The sketch IS an aggregation: one map-side-combinable groupBy over
  * (depth × hash-slot) keys, so building it at 100 TB is a single shuffle
  * whose output is bounded by depth × width rows regardless of input size —
  * and two sketches merge by summing counts (the groupBy does exactly that
  * across partitions). Estimates join against the tiny sketch relation,
  * which Spark auto-broadcasts.
  *
  * Deterministic guarantee (gated, not probabilistic): an estimate is NEVER
  * below the true count, and every depth row sums to the total item count.
  */
object Sketches {

  private def slots(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d =>
      pmod(xxhash64(key, lit(d)), lit(width.toLong))): _*)

  /** Build the (d, slot, cnt) sketch relation for `key` occurrences. */
  def countMinSketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 2048): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")
    df.select(posexplode(slots(key, depth, width)).as(Seq("d", "slot")))
      .groupBy("d", "slot").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the distinct keys of `keys`: min over the key's
    * depth counters. Missing slots count 0 (key never seen). Shape must
    * match the sketch's build parameters. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int = 4, width: Int = 2048): DataFrame =
    keys.select(key.as("k"), posexplode(slots(key, depth, width)).as(Seq("d", "slot")))
      // the sketch is ≤ depth·width rows — broadcast it (the RIGHT,
      // non-preserved side of the left join, so the hint is usable)
      .join(broadcast(sketch), Seq("d", "slot"), "left")
      .groupBy("k").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
