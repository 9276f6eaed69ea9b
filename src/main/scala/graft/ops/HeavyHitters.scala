package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a high-cardinality column WITHOUT shuffling the
  * full multiset. Beyond-reference addition for corpus-scale vocabulary /
  * domain / n-gram frequency cuts, where a plain groupBy would shuffle
  * billions of distinct keys to answer a question about the few hot ones.
  *
  * Two passes:
  *   1. per-partition Misra-Gries summaries (capacity k counters, pure
  *      `mapPartitions`, zero shuffle). MG guarantees every item whose
  *      count within a partition exceeds n_p/k survives that partition's
  *      summary; summing the guarantee over partitions, every item with
  *      GLOBAL count ≥ N/k survives in at least one partition — so with
  *      k ≥ N/minFreq the candidate set is a superset of the true answer.
  *   2. exact recount of ONLY the candidates: the candidate set (≤ k ×
  *      partitions rows) broadcasts, the big side filters map-side, and the
  *      final groupBy shuffles just the candidate-matching rows.
  *
  * The result is EXACT (the sketch can only over-admit; the recount +
  * threshold discards false candidates), which is what makes it gateable
  * against a plain GROUP BY ... HAVING oracle.
  */
object HeavyHitters {

  /** All items (values of `itemCol`, nulls excluded) with global frequency
    * ≥ `minFreq`, with their exact counts. One counting job + one
    * mapPartitions sketch pass + one broadcast-filtered recount. */
  def exactOverThreshold(items: DataFrame, itemCol: String,
      minFreq: Long): DataFrame = {
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val vals = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    // Pass 0: N fixes the MG capacity that makes the superset guarantee
    // hold. NO silent clamp: a capacity below N/minFreq would silently drop
    // true heavy hitters, so an infeasible threshold is an error the caller
    // must resolve (raise minFreq, or pre-aggregate into counted runs).
    val total = vals.count()
    val needed = total / minFreq + 1
    require(needed <= 4000000L,
      s"minFreq=$minFreq over $total items needs $needed Misra-Gries counters " +
        "per partition (> 4M); raise minFreq or pre-aggregate the input")
    val capacity = math.max(needed, 16L).toInt
    // Pass 1: Misra-Gries per partition. Admit new items while capacity
    // lasts; once full, decrement ALL counters instead of admitting (the
    // classical summary — each decrement "pays" with one occurrence of every
    // tracked item, so an item with cnt_p > n_p/capacity can never reach 0
    // for good).
    val candidates = vals.select("item").as(Encoders.STRING)
      .mapPartitions { it =>
        val counts = new scala.collection.mutable.HashMap[String, Long]
        it.foreach { v =>
          if (counts.contains(v)) counts(v) += 1L
          else if (counts.size < capacity) counts(v) = 1L
          else {
            val dead = counts.iterator.collect { case (k, c) if c == 1L => k }.toList
            counts.mapValuesInPlace((_, c) => c - 1L)
            dead.foreach(counts.remove)
          }
        }
        counts.keysIterator
      }(Encoders.STRING)
      .toDF("item").distinct()
    // Pass 2: exact recount of candidates only; broadcast keeps the big side
    // shuffle-free until the (tiny) candidate-matching remainder.
    vals.join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") >= minFreq)
  }
}
