package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** Semi-join reduction via a broadcast Bloom filter — the standard 100 TB
  * join-pruning move when the small side is too big to broadcast-join but its
  * KEY SET sketches into a few MB: rows of the big side that cannot possibly
  * match are dropped at the scan, before the shuffle, at the cost of an
  * `fpp` fraction of false survivors (which the real join then discards —
  * the reduction is an over-approximation, never lossy).
  *
  * Complements AQE's automatic runtime bloom filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) with an explicit,
  * reusable handle: build once, reduce many frames.
  */
object Prefilter {

  /** Build a Bloom filter over `key` of `keys` and return a predicate Column
    * factory for long keys on any other frame. */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Column => Column = {
    val bf = keys.stat.bloomFilter(key, expectedItems, fpp)
    val bc = keys.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bc.value.mightContainLong(k))
    (c: Column) => might(c)
  }

  /** Drop `big` rows whose `bigKey` cannot appear in `small`'s `smallKey`
    * set. Result is a superset of the exact semi-join (false-positive rate
    * `fpp`), produced with no shuffle of `big`. */
  def bloomSemiReduce(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    big.where(bloomOf(small, smallKey, expectedItems, fpp)(bigKey))
}
