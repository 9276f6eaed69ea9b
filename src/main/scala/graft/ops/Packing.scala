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

  /** Full training-sequence layout: [[packByTokens]] plus, per document,
    * its SEGMENT index within the pack (0-based, key order) and the token
    * offset its first token occupies in the pack — exactly what a trainer
    * needs to build position ids and block-diagonal attention masks for
    * packed sequences. Same boundary formulation and scale shape (one
    * window per bucket plus a row_number over each pack's handful of
    * members); the offset is closed-form (`start − pack·targetTokens`),
    * so the layout stays engine-portable. */
  def packLayout(docs: DataFrame, key: Column, tokenCount: Column,
      targetTokens: Long, numBuckets: Int = 32): DataFrame = {
    require(targetTokens >= 1 && numBuckets >= 1)
    val w = Window.partitionBy(col("bucket")).orderBy(key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy(col("bucket"), col("pack")).orderBy(key.asc)
    docs
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("bucket", pmod(key, lit(numBuckets.toLong)))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack", expr(s"__start div $targetTokens"))
      .withColumn("seg", (row_number().over(wp) - 1).cast("long"))
      .withColumn("pack_offset", col("__start") - col("pack") * targetTokens)
      .drop("__start")
  }

  /** First-fit-decreasing packing — the HARD-CAP complement of
    * [[packByTokens]] (which never splits but may overrun): within each
    * bucket, documents are taken largest-first (ties by key) and placed in
    * the first open pack with room; a document larger than `targetTokens`
    * gets a pack of its own. No pack except oversized singletons exceeds
    * the target, and the classic FFD guarantee holds — at most one pack
    * per bucket ends up less than half full (gated as a contract).
    *
    * Scale: ONE shuffle (repartition by bucket) + an in-partition sort,
    * then a single sequential pass per bucket (first-fit state is a plain
    * in-memory list of open packs — bounded by the bucket's pack count, so
    * size buckets to the cluster). Deterministic for a fixed engine: the
    * order and the placement rule are pure functions of (key, tokens).
    * Returns the assignment relation `(key, n_tokens, bucket, pack,
    * pack_offset)` — join it back to the corpus by key. */
  def packFirstFit(docs: DataFrame, key: Column, tokenCount: Column,
      targetTokens: Long, numBuckets: Int = 32): DataFrame = {
    require(targetTokens >= 1 && numBuckets >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    // fail fast on non-integral keys: the silent cast("long") below would
    // truncate doubles (merging distinct keys) or null out strings
    docs.select(key).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"packFirstFit needs an integral key column, got $other")
    }
    val prepped = docs
      .select(key.cast("long").as("key"), tokenCount.cast("long").as("n_tokens"),
        pmod(key, lit(numBuckets.toLong)).as("bucket"))
      .repartition(math.min(numBuckets, 256), col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tokens").desc, col("key").asc)
      .as[(Long, Long, Long)]
    prepped.mapPartitions { it =>
      // a partition holds whole buckets, bucket-contiguous after the sort;
      // reset first-fit state at each bucket change
      var curBucket = Long.MinValue
      var packs = scala.collection.mutable.ArrayBuffer.empty[Long] // fill per pack
      it.map { case (k, n, b) =>
        if (b != curBucket) { curBucket = b; packs = scala.collection.mutable.ArrayBuffer.empty }
        var p = 0
        while (p < packs.length && packs(p) + n > targetTokens) p += 1
        if (p == packs.length) packs += 0L
        val offset = packs(p)
        packs(p) += n
        (k, n, b, p.toLong, offset)
      }
    }.toDF("key", "n_tokens", "bucket", "pack", "pack_offset")
  }

  /** Split documents into token-bounded overlapping chunks (the
    * context-window prep step upstream of packing): chunk i covers tokens
    * `[i·(chunkTokens−overlap), …+chunkTokens)` on the whitespace
    * tokenization, re-joined with single spaces. A chunk starts at
    * every stride index below the token count, so trailing chunks may be
    * short (callers wanting only chunks that add new content drop those
    * with `chunk_no·stride + overlap ≥ n_tokens`).
    *
    * Output: (doc_id, chunk_no, chunk_tokens, chunk_text). Pure columnar
    * sequence+slice — a narrow map with a bounded explode (≤ n/stride
    * chunks per doc), no shuffle, codegen-friendly. */
  def chunkByTokens(docs: DataFrame, textCol: String = "text",
      chunkTokens: Int = 128, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    Par.spread(docs)
      .select(col("doc_id"),
        graft.lib.Features.tokenizeGaps(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride))))
      .where(col("col") < size(col("__toks")))
      .select(col("doc_id"), col("pos").as("chunk_no"),
        slice(col("__toks"), col("col") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col("doc_id"), col("chunk_no"),
        size(col("__chunk")).as("chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
