package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points to enclosing intervals — via bucket
  * expansion. Beyond-reference addition (the reference's only non-equi path
  * is cross+filter, SURVEY §2.4/§4.2), and the Spark-first answer to a join
  * Catalyst would otherwise plan as BroadcastNestedLoop/cartesian + filter.
  *
  * Each interval explodes into the fixed-width buckets it overlaps; each
  * point maps to exactly ONE bucket; the join is then a plain equi-join on
  * the bucket id followed by the exact range predicate. Because a point
  * lands in a single bucket, no post-join dedup is needed.
  *
  * Scale: shuffle cost is |points| + Σ_i ceil(span_i / bucketWidth) rows —
  * linear, uniform bucket keys, no cross product. Pick `bucketWidth` near the
  * median interval span so intervals explode into O(1) buckets; extremely
  * long intervals (span >> width) can be routed through a coarser second
  * bucket tier if they ever dominate.
  */
object RangeJoin {

  /** Inner-join `points` to every interval with
    * `startCol <= pointCol <= endCol` (both inclusive). Column names must be
    * disjoint across the two inputs. All three columns must be integral and
    * non-negative (epoch micros/millis, positions, ids...). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // `div` (integral division), not `/`: Column./ on longs is true division
    // to double, which loses exactness past 2^53 (epoch nanos overflow that)
    val iv = intervals.where(col(startCol) <= col(endCol))
      .withColumn("__bucket",
        explode(sequence(expr(s"$startCol div $bucketWidth"),
          expr(s"$endCol div $bucketWidth"))))
    val pt = points.withColumn("__bucket", expr(s"$pointCol div $bucketWidth"))
    pt.join(iv, "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
