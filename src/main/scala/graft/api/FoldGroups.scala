package graft.api

import org.apache.spark.sql.{Encoder, Encoders}

/** Runtime half of the macro's fold-group fusion (the reference fuses a
  * fold over each group INTO the grouping so no group is ever
  * materialized — emma-compiler FoldGroupFusion.scala; here the same
  * shape arises from a correlated scalar fold in a comprehension head,
  * `yield (x, ys.withFilter(y => k(y) == k'(x)).map(v).sum)`, and lowers
  * to ONE pre-aggregation of the inner bag by its key followed by a left
  * outer join). Group-sized state, two shuffles total (one combinable
  * aggregation + one join, both on the same key), instead of a per-outer-
  * row job or an executor-side bag capture.
  */
object FoldGroups {

  /** For each left element: the SUM of right values under the matching
    * key, `num.zero` when none — exactly the correlated fold's value
    * (the sum of an empty bag is the monoid zero). `size`/`count` arrive
    * here as sums of `1L`. The aggregation is a typed reduce (map-side
    * partial merge), so only one (key, partial) row per key per
    * partition reaches the shuffle. */
  def sumJoin[A, K, V](left: DataBag[A], right: DataBag[(K, V)])(ka: A => K)(
      implicit num: Numeric[V], encK: Encoder[K], encV: Encoder[V],
      encOut: Encoder[(A, V)],
      encOpt: Encoder[(A, Option[(K, V)])]): DataBag[(A, V)] = {
    implicit val encKV: Encoder[(K, V)] = Encoders.tuple(encK, encV)
    val summed = new DataBag(
      right.ds.groupByKey(_._1)
        .reduceGroups((a: (K, V), b: (K, V)) => (a._1, num.plus(a._2, b._2)))
        .map(_._2))
    left.leftOuterJoin(summed)(ka, _._1)
      .map { case (a, opt) => (a, opt.map(_._2).getOrElse(num.zero)) }
  }

  /** For each left element: the top (or bottom, `smallest = true`) `n`
    * right values under the matching key as a sorted list, `Nil` when
    * none — the correlated `filter(key match).top(n)` fold. The per-key
    * aggregation runs the bag's own bounded-heap [[graft.api.alg.Top]]
    * algebra through the typed-UDAF adapter, so each partition sends at
    * most n values per key to the shuffle. */
  def topJoin[A, K, V](left: DataBag[A], right: DataBag[(K, V)], n: Int,
      ord: Ordering[V], smallest: Boolean)(ka: A => K)(
      implicit encK: Encoder[K], encList: Encoder[List[V]],
      encOut: Encoder[(A, List[V])],
      encOpt: Encoder[(A, Option[(K, List[V])])]): DataBag[(A, List[V])] = {
    import graft.api.alg.{Alg, AlgAggregator, Bottom, MapAlg, Top}
    implicit val encKL: Encoder[(K, List[V])] = Encoders.tuple(encK, encList)
    val alg: Alg[(K, V), List[V]] =
      MapAlg((kv: (K, V)) => kv._2, if (smallest) Bottom(n, ord) else Top(n, ord))
    val agged = new DataBag(
      right.ds.groupByKey(_._1).agg(AlgAggregator.column(alg)))
    left.leftOuterJoin(agged)(ka, _._1)
      .map { case (a, opt) => (a, opt.map(_._2).getOrElse(Nil: List[V])) }
  }
}
