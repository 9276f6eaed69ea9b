package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: plan which documents share a
  * training sequence ("pack") of ~`targetTokens` tokens.
  *
  * True first-fit packing is a sequential recurrence (each decision depends
  * on the running remainder), so it neither parallelizes nor reproduces
  * across engines. This operator uses the boundary formulation instead: lay
  * documents end-to-end in a deterministic order and cut at every multiple of
  * `targetTokens` — a document joins the pack its FIRST token falls in, so a
  * pack may overrun by at most one document's tokens (callers wanting a hard
  * cap pre-split or pre-filter long documents). One window aggregation per
  * bucket: deterministic, engine-portable, and embarrassingly parallel —
  * buckets are independent hash groups sized to the cluster, documents never
  * shuffle globally.
  */
object Packing {

  /** Assign each document to (bucket, pack): `bucket` = key mod `numBuckets`
    * (the parallelism unit), `pack` = exclusive-prefix-token-count div
    * `targetTokens` within the bucket, ordered by `key`. Output adds
    * `n_tokens`, `bucket`, `pack`. */
  def packByTokens(docs: DataFrame, key: Column, tokenCount: Column,
      targetTokens: Long, numBuckets: Int = 32): DataFrame = {
    require(targetTokens >= 1 && numBuckets >= 1)
    val w = Window.partitionBy(col("bucket")).orderBy(key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("bucket", pmod(key, lit(numBuckets.toLong)))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack", expr(s"(__cum - n_tokens) div $targetTokens"))
      .drop("__cum")
  }
}
