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

  /** The fold-FOREST fusion shape (the reference fuses N independent
    * folds of one group into one pass, FoldForestFusion.scala): the macro
    * batches same-root/same-key correlated folds into ONE keyed relation
    * whose value is the TUPLE of per-fold contributions, combined
    * componentwise by `comb` — one combinable aggregation + one join for
    * the whole batch instead of one of each PER FOLD. `miss` supplies the
    * empty-group tuple (monoid zeros; a `min`/`max` component throws — the
    * sequential semantics). */
  def reduceJoin[A, K, V](left: DataBag[A], right: DataBag[(K, V)])(
      comb: (V, V) => V)(miss: () => V)(ka: A => K)(
      implicit encK: Encoder[K], encV: Encoder[V], encOut: Encoder[(A, V)],
      encOpt: Encoder[(A, Option[(K, V)])]): DataBag[(A, V)] = {
    implicit val encKV: Encoder[(K, V)] = Encoders.tuple(encK, encV)
    val reduced = new DataBag(
      right.ds.groupByKey(_._1)
        .reduceGroups((a: (K, V), b: (K, V)) => (a._1, comb(a._2, b._2)))
        .map(_._2))
    left.leftOuterJoin(reduced)(ka, _._1)
      .map { case (a, opt) => (a, opt.map(_._2).getOrElse(miss())) }
  }

  /** Componentwise combiners/zeros for [[reduceJoin]] batches — implicit
    * Numeric/Ordering re-resolve at the macro's emitted call site. */
  def plus[V](a: V, b: V)(implicit num: Numeric[V]): V = num.plus(a, b)
  def lesser[V](a: V, b: V, ord: Ordering[V]): V =
    if (ord.compare(a, b) <= 0) a else b
  def greater[V](a: V, b: V, ord: Ordering[V]): V =
    if (ord.compare(a, b) >= 0) a else b
  def zero[V](implicit num: Numeric[V]): V = num.zero
  def emptyGroup(kind: String): Nothing =
    throw new NoSuchElementException(kind + " of an empty group")

  /** For each left element: the MIN (`smallest = true`) or MAX of right
    * values under the matching key — the correlated `filter(key match)
    * [.map(v)].min/max` fold. An empty group THROWS the same
    * `NoSuchElementException` the sequential `min` of an empty bag throws
    * (surfacing wrapped in the task failure), so programs that do not
    * crash get identical values and the plan is one combinable reduce +
    * one join instead of a per-outer-row scan or an executor-side bag
    * capture. */
  def minMaxJoin[A, K, V](left: DataBag[A], right: DataBag[(K, V)],
      smallest: Boolean, ord: Ordering[V])(ka: A => K)(
      implicit encK: Encoder[K], encV: Encoder[V], encOut: Encoder[(A, V)],
      encOpt: Encoder[(A, Option[(K, V)])]): DataBag[(A, V)] = {
    implicit val encKV: Encoder[(K, V)] = Encoders.tuple(encK, encV)
    val reduced = new DataBag(
      right.ds.groupByKey(_._1)
        .reduceGroups((a: (K, V), b: (K, V)) =>
          if ((ord.compare(a._2, b._2) <= 0) == smallest) a else b)
        .map(_._2))
    left.leftOuterJoin(reduced)(ka, _._1)
      .map { case (a, opt) => (a, opt.map(_._2).getOrElse(
        throw new NoSuchElementException(
          (if (smallest) "min" else "max") + " of an empty group"))) }
  }

  /** For each left element: the top (or bottom, `smallest = true`) `n`
    * right values under the matching key as a sorted list, `Nil` when
    * none — the correlated `filter(key match).top(n)` fold. The per-key
    * aggregation runs the bag's own bounded-heap [[graft.api.alg.Top]]
    * algebra through the typed-UDAF adapter, so each partition sends at
    * most n values per key to the shuffle. */
  /** For each left element: ALL right values under the matching key as a
    * List — ORDER UNSPECIFIED, the same contract as `DataBag.collect()`
    * on a bag — `Nil` when none. This is the correlated
    * `filter(key match)[.map(v)].collect()` NESTED-RESULT fold (SQL's
    * correlated ARRAY subquery; the reference reaches the shape through
    * comprehension nesting + fold fusion). There is nothing to reduce —
    * every value crosses the shuffle by definition of the result — so the
    * aggregation is a grouped materialization (mapGroups), costed exactly
    * like the groupBy the query semantically is; deterministic consumers
    * sort the list locally (`.sorted.mkString`, etc.). */
  def collectJoin[A, K, V](left: DataBag[A], right: DataBag[(K, V)])(
      ka: A => K)(implicit encK: Encoder[K], encList: Encoder[List[V]],
      encOut: Encoder[(A, List[V])],
      encOpt: Encoder[(A, Option[(K, List[V])])]): DataBag[(A, List[V])] = {
    implicit val encKL: Encoder[(K, List[V])] = Encoders.tuple(encK, encList)
    val agged = new DataBag(
      right.ds.groupByKey(_._1)
        .mapGroups((k: K, it: Iterator[(K, V)]) => (k, it.map(_._2).toList)))
    left.leftOuterJoin(agged)(ka, _._1)
      .map { case (a, opt) => (a, opt.map(_._2).getOrElse(Nil: List[V])) }
  }

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
