package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle for training-order assembly: every row gets
  * a (shard, pos) pair that is a pure function of (seed, row key) — the same
  * corpus with the same seed yields byte-identical training order on any
  * cluster size, any engine, any rerun. That reproducibility is the whole
  * point: a training run must be re-creatable from (corpus version, seed)
  * alone, and an engine-native `rand()` or partition-index scheme is neither
  * portable nor stable under repartitioning.
  *
  * Spark-first scale design: the order key is an md5 prefix (hex strings
  * compare lexicographically = numerically, the same trick as
  * [[Sampling.hashDraw]]), the shard is the first two nibbles mod nShards —
  * so shard assignment needs NO shuffle at all, and the intra-shard position
  * is one `row_number` window whose partition key is the shard: Spark
  * shuffles each shard's rows to one task and sorts there. At 100 TB you
  * size nShards so a shard fits a task's sort budget (shards are hash-
  * balanced by construction); the alternative global `orderBy` would range-
  * sample and produce sampler-dependent (non-reproducible) shard cuts.
  */
object Shuffling {

  /** Portable pseudorandom order key: md5 over "seed-key". */
  def orderKey(seed: Long, key: Column): Column =
    md5(concat_ws("-", lit(seed), key.cast("string")))

  /** Deterministic shard in [0, nShards) from the key's first two hex
    * nibbles — uniform for nShards dividing 256 (use such values). */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(conv(substring(key, 1, 2), 16, 10).cast("long"), lit(nShards.toLong))

  /** Adds `shard` and a dense 0-based `pos` within each shard, ordered by
    * the md5 key with the row key as the total-order tie-break.
    *
    * @param key     unique row key (drives both order and shard)
    * @param nShards number of output shards; divisors of 256 give exactly
    *                uniform shard sizes in expectation
    * @param seed    training-order seed
    */
  def deterministicShuffle(df: DataFrame, key: Column, nShards: Int,
      seed: Long): DataFrame = {
    require(nShards >= 1 && nShards <= 256, "nShards must be in [1, 256]")
    val k = orderKey(seed, key)
    val w = Window.partitionBy("shard").orderBy(col("__ok"), col("__tie"))
    df.withColumn("__ok", k)
      .withColumn("__tie", key.cast("string"))
      .withColumn("shard", shardOf(col("__ok"), nShards))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__ok", "__tie")
  }
}
