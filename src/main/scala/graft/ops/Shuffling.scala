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

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Deterministic weighted interleave of K corpora — the data-mixing step
    * that assembles one training stream from several sources at fixed
    * ratios. Every row gets a dense global position `gpos` such that any
    * prefix of the merged order contains the sources in proportion to their
    * weights (stride scheduling: source i's rows occupy virtual times
    * (pos+1)·(W/w_i), W = lcm of weights; ties resolve to the earlier
    * source).
    *
    * The scale point: `gpos` is computed in CLOSED FORM — rank = own pos +
    * Σ_j (rows of source j strictly earlier), where the j-term is
    * min(n_j, vt·w_j/W) in exact integer arithmetic — so there is NO global
    * sort and NO single-partition window: one per-source `row_number`
    * window plus a pure projection. A global `orderBy`+`row_number` would
    * funnel 100 TB through one task; this shape shuffles each source once.
    * Only the K source sizes land on the driver (scalars, same class as
    * k-means centroids).
    *
    * All sources must share the schema of the first (`unionByName`); the
    * result carries the original columns plus `source` and `gpos`.
    *
    * @param sources (name, frame, integer weight > 0) per corpus
    * @param keyName unique key column present in every source
    * @param seed    training-order seed (drives the per-source order)
    */
  def weightedInterleave(sources: Seq[(String, DataFrame, Int)], keyName: String,
      seed: Long): DataFrame = {
    require(sources.nonEmpty, "weightedInterleave needs at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    val weights = sources.map(_._3.toLong)
    val big = weights.reduce((a, b) => a / gcd(a, b) * b) // lcm
    val strides = weights.map(big / _)
    val tagged = sources.zipWithIndex.map { case ((name, df, _), i) =>
      df.withColumn("source", lit(name)).withColumn("__src", lit(i))
    }.reduce(_ unionByName _)
    val win = Window.partitionBy("__src").orderBy(col("__ok"), col("__tie"))
    val posed = tagged
      .withColumn("__ok", orderKey(seed, col(keyName)))
      .withColumn("__tie", col(keyName).cast("string"))
      .withColumn("__pos", (row_number().over(win) - 1).cast("long"))
      .drop("__ok", "__tie")
    val sizes: Map[Int, Long] = posed.groupBy("__src").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // per-source rank expression, exact BIGINT arithmetic end to end (DIV,
    // not double division) — vt fits a long for any realistic corpus
    val rankBySrc = sources.indices.map { i =>
      val vt = s"((__pos + 1) * ${strides(i)}L)"
      val terms = sources.indices.filter(_ != i).map { j =>
        val nj = sizes.getOrElse(j, 0L)
        // tie at equal virtual time goes to the smaller source index
        val cnt = if (j < i) s"($vt div ${strides(j)}L)"
                  else s"(($vt - 1L) div ${strides(j)}L)"
        s"least(${nj}L, $cnt)"
      }
      i -> expr(("__pos" +: terms).mkString(" + "))
    }
    val gpos = rankBySrc.tail.foldLeft(
      when(col("__src") === rankBySrc.head._1, rankBySrc.head._2)) {
      case (acc, (i, e)) => acc.when(col("__src") === i, e)
    }.otherwise(lit(null))
    posed.withColumn("gpos", gpos.cast("long")).drop("__src", "__pos")
  }
}
