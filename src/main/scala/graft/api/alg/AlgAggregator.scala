package graft.api.alg

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Adapter from the bag algebra to Spark's typed UDAF surface: any
  * `Alg[A, B]` is an `Aggregator[A, B, B]` (the commutative monoid IS the
  * UDAF contract — zero/init/plus map onto zero/reduce/merge, SURVEY §2.8).
  *
  * Use where a `TypedColumn` is wanted rather than a full bag fold:
  * `ds.groupByKey(_.k).agg(AlgAggregator(Sum[Long]()).toColumn)` or
  * `ds.select(AlgAggregator(alg).toColumn)` — Spark runs it with map-side
  * partial aggregation, same physics as [[graft.api.DataBag.foldGroup]].
  */
case class AlgAggregator[A, B](alg: Alg[A, B])(implicit encB: Encoder[B])
    extends Aggregator[A, B, B] {
  def zero: B = alg.zero
  def reduce(b: B, a: A): B = alg.plus(b, alg.init(a))
  def merge(b1: B, b2: B): B = alg.plus(b1, b2)
  def finish(b: B): B = b
  def bufferEncoder: Encoder[B] = encB
  def outputEncoder: Encoder[B] = encB
}

object AlgAggregator {
  /** The aggregator as a ready-to-use typed column. */
  def column[A, B: Encoder](alg: Alg[A, B]): TypedColumn[A, B] =
    AlgAggregator(alg).toColumn
}
