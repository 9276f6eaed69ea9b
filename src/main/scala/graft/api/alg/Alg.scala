package graft.api.alg

/** Commutative-monoid algebra parameterizing every structural-recursion fold.
  *
  * A bag is algebraically `Empty | Sng(x) | Union(xs, ys)`; `fold(alg)` maps
  * `Empty -> zero`, `Sng(x) -> init(x)`, `Union -> plus`. `plus` must be
  * associative and commutative with identity `zero` for the result to be
  * well-defined on an unordered, partitioned collection.
  *
  * Semantics follow the reference DataBag algebra
  * (emma-language/src/main/scala/org/emmalanguage/api/alg/Alg.scala:38-176);
  * implementation here is original and executes via Spark map-side partial
  * aggregation (see [[graft.api.DataBag.fold]]).
  *
  * Members are abstract *methods* (not function-valued fields): lambda-valued
  * fields fail Java deserialization on Spark executors
  * (SerializedLambda-to-Function2 field assignment), methods serialize with
  * the instance.
  */
trait Alg[-A, B] extends Serializable {
  def zero: B
  def init(x: A): B
  def plus(x: B, y: B): B
}

case class Fold[A, B](zero: B, initFn: A => B, plusFn: (B, B) => B) extends Alg[A, B] {
  def init(x: A): B = initFn(x)
  def plus(x: B, y: B): B = plusFn(x, y)
}

case class Reduce[A](zero: A, p: (A, A) => A) extends Alg[A, A] {
  def init(x: A): A = x
  def plus(x: A, y: A): A = p(x, y)
}

case class ReduceOpt[A](p: (A, A) => A) extends Alg[A, Option[A]] {
  def zero: Option[A] = None
  def init(x: A): Option[A] = Some(x)
  def plus(x: Option[A], y: Option[A]): Option[A] = (x, y) match {
    case (Some(a), Some(b)) => Some(p(a, b))
    case _                  => x.orElse(y)
  }
}

case object IsEmpty extends Alg[Any, Boolean] {
  def zero = true
  def init(x: Any): Boolean = false
  def plus(x: Boolean, y: Boolean): Boolean = x && y
}

case object NonEmpty extends Alg[Any, Boolean] {
  def zero = false
  def init(x: Any): Boolean = true
  def plus(x: Boolean, y: Boolean): Boolean = x || y
}

case object Size extends Alg[Any, Long] {
  def zero = 0L
  def init(x: Any): Long = 1L
  def plus(x: Long, y: Long): Long = x + y
}

case class Count[A](p: A => Boolean) extends Alg[A, Long] {
  def zero = 0L
  def init(x: A): Long = if (p(x)) 1L else 0L
  def plus(x: Long, y: Long): Long = x + y
}

case class Min[A](ord: Ordering[A]) extends Alg[A, Option[A]] {
  def zero: Option[A] = None
  def init(x: A): Option[A] = Some(x)
  def plus(x: Option[A], y: Option[A]): Option[A] = (x, y) match {
    case (Some(a), Some(b)) => Some(ord.min(a, b))
    case _                  => x.orElse(y)
  }
}

case class Max[A](ord: Ordering[A]) extends Alg[A, Option[A]] {
  def zero: Option[A] = None
  def init(x: A): Option[A] = Some(x)
  def plus(x: Option[A], y: Option[A]): Option[A] = (x, y) match {
    case (Some(a), Some(b)) => Some(ord.max(a, b))
    case _                  => x.orElse(y)
  }
}

case class Sum[A](num: Numeric[A]) extends Alg[A, A] {
  def zero: A = num.zero
  def init(x: A): A = x
  // Long/Int sums add exactly (raising on overflow) so the object-fold path
  // agrees with the ANSI-checked Catalyst HashAggregate the columnar fast
  // path routes to — result must not depend on which path a scope picks.
  def plus(x: A, y: A): A =
    if (num eq Numeric.LongIsIntegral)
      Math.addExact(x.asInstanceOf[Long], y.asInstanceOf[Long]).asInstanceOf[A]
    else if (num eq Numeric.IntIsIntegral)
      Math.addExact(x.asInstanceOf[Int], y.asInstanceOf[Int]).asInstanceOf[A]
    else num.plus(x, y)
}

case class Product[A](num: Numeric[A]) extends Alg[A, A] {
  def zero: A = num.one
  def init(x: A): A = x
  def plus(x: A, y: A): A = num.times(x, y)
}

case class Exists[A](p: A => Boolean) extends Alg[A, Boolean] {
  def zero = false
  def init(x: A): Boolean = p(x)
  def plus(x: Boolean, y: Boolean): Boolean = x || y
}

case class Forall[A](p: A => Boolean) extends Alg[A, Boolean] {
  def zero = true
  def init(x: A): Boolean = p(x)
  def plus(x: Boolean, y: Boolean): Boolean = x && y
}

case class Find[A](p: A => Boolean) extends Alg[A, Option[A]] {
  def zero: Option[A] = None
  def init(x: A): Option[A] = Some(x).filter(p)
  def plus(x: Option[A], y: Option[A]): Option[A] = x.orElse(y)
}

/** Smallest n elements as a sorted list (merge-based bounded top-k). */
case class Bottom[A](n: Int, ord: Ordering[A]) extends Alg[A, List[A]] {
  def zero: List[A] = Nil
  def init(x: A): List[A] = x :: Nil
  def plus(xs: List[A], ys: List[A]): List[A] = {
    // merge two sorted lists, keep first n
    val buf = scala.collection.mutable.ListBuffer.empty[A]
    var (l, r) = (xs, ys)
    while (buf.size < n && (l.nonEmpty || r.nonEmpty)) {
      if (r.isEmpty || (l.nonEmpty && ord.lteq(l.head, r.head))) { buf += l.head; l = l.tail }
      else { buf += r.head; r = r.tail }
    }
    buf.toList
  }
}

/** Largest n elements as a sorted (descending) list. */
case class Top[A](n: Int, ord: Ordering[A]) extends Alg[A, List[A]] {
  private val bottom = Bottom(n, ord.reverse)
  def zero: List[A] = Nil
  def init(x: A): List[A] = x :: Nil
  def plus(x: List[A], y: List[A]): List[A] = bottom.plus(x, y)
}

/** Product algebra: run two independent folds in one pass (reference Alg2..Alg22;
  * arbitrary arity is recovered by nesting — Spark's multi-column agg subsumes the
  * columnar case, this covers arbitrary Scala monoids). */
case class Alg2[A, B1, B2](a1: Alg[A, B1], a2: Alg[A, B2]) extends Alg[A, (B1, B2)] {
  def zero: (B1, B2) = (a1.zero, a2.zero)
  def init(x: A): (B1, B2) = (a1.init(x), a2.init(x))
  def plus(x: (B1, B2), y: (B1, B2)): (B1, B2) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2))
}

case class Alg3[A, B1, B2, B3](a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3])
    extends Alg[A, (B1, B2, B3)] {
  def zero: (B1, B2, B3) = (a1.zero, a2.zero, a3.zero)
  def init(x: A): (B1, B2, B3) = (a1.init(x), a2.init(x), a3.init(x))
  def plus(x: (B1, B2, B3), y: (B1, B2, B3)): (B1, B2, B3) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3))
}

case class Alg4[A, B1, B2, B3, B4](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4])
    extends Alg[A, (B1, B2, B3, B4)] {
  def zero: (B1, B2, B3, B4) = (a1.zero, a2.zero, a3.zero, a4.zero)
  def init(x: A): (B1, B2, B3, B4) = (a1.init(x), a2.init(x), a3.init(x), a4.init(x))
  def plus(x: (B1, B2, B3, B4), y: (B1, B2, B3, B4)): (B1, B2, B3, B4) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3), a4.plus(x._4, y._4))
}

case class Alg5[A, B1, B2, B3, B4, B5](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4], a5: Alg[A, B5])
    extends Alg[A, (B1, B2, B3, B4, B5)] {
  def zero: (B1, B2, B3, B4, B5) = (a1.zero, a2.zero, a3.zero, a4.zero, a5.zero)
  def init(x: A): (B1, B2, B3, B4, B5) =
    (a1.init(x), a2.init(x), a3.init(x), a4.init(x), a5.init(x))
  def plus(x: (B1, B2, B3, B4, B5), y: (B1, B2, B3, B4, B5)): (B1, B2, B3, B4, B5) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3),
      a4.plus(x._4, y._4), a5.plus(x._5, y._5))
}

case class Alg6[A, B1, B2, B3, B4, B5, B6](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4], a5: Alg[A, B5],
    a6: Alg[A, B6])
    extends Alg[A, (B1, B2, B3, B4, B5, B6)] {
  def zero: (B1, B2, B3, B4, B5, B6) =
    (a1.zero, a2.zero, a3.zero, a4.zero, a5.zero, a6.zero)
  def init(x: A): (B1, B2, B3, B4, B5, B6) =
    (a1.init(x), a2.init(x), a3.init(x), a4.init(x), a5.init(x), a6.init(x))
  def plus(x: (B1, B2, B3, B4, B5, B6), y: (B1, B2, B3, B4, B5, B6)): (B1, B2, B3, B4, B5, B6) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3),
      a4.plus(x._4, y._4), a5.plus(x._5, y._5), a6.plus(x._6, y._6))
}

case class Alg7[A, B1, B2, B3, B4, B5, B6, B7](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4], a5: Alg[A, B5],
    a6: Alg[A, B6], a7: Alg[A, B7])
    extends Alg[A, (B1, B2, B3, B4, B5, B6, B7)] {
  def zero: (B1, B2, B3, B4, B5, B6, B7) =
    (a1.zero, a2.zero, a3.zero, a4.zero, a5.zero, a6.zero, a7.zero)
  def init(x: A): (B1, B2, B3, B4, B5, B6, B7) =
    (a1.init(x), a2.init(x), a3.init(x), a4.init(x), a5.init(x), a6.init(x), a7.init(x))
  def plus(x: (B1, B2, B3, B4, B5, B6, B7),
      y: (B1, B2, B3, B4, B5, B6, B7)): (B1, B2, B3, B4, B5, B6, B7) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3),
      a4.plus(x._4, y._4), a5.plus(x._5, y._5), a6.plus(x._6, y._6),
      a7.plus(x._7, y._7))
}

case class Alg8[A, B1, B2, B3, B4, B5, B6, B7, B8](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4], a5: Alg[A, B5],
    a6: Alg[A, B6], a7: Alg[A, B7], a8: Alg[A, B8])
    extends Alg[A, (B1, B2, B3, B4, B5, B6, B7, B8)] {
  def zero: (B1, B2, B3, B4, B5, B6, B7, B8) =
    (a1.zero, a2.zero, a3.zero, a4.zero, a5.zero, a6.zero, a7.zero, a8.zero)
  def init(x: A): (B1, B2, B3, B4, B5, B6, B7, B8) =
    (a1.init(x), a2.init(x), a3.init(x), a4.init(x), a5.init(x), a6.init(x),
      a7.init(x), a8.init(x))
  def plus(x: (B1, B2, B3, B4, B5, B6, B7, B8),
      y: (B1, B2, B3, B4, B5, B6, B7, B8)): (B1, B2, B3, B4, B5, B6, B7, B8) =
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3),
      a4.plus(x._4, y._4), a5.plus(x._5, y._5), a6.plus(x._6, y._6),
      a7.plus(x._7, y._7), a8.plus(x._8, y._8))
}

/** Variadic product algebra: ANY number of independent folds in one pass.
  * The typed tuple road stops at [[Alg8]] (matching how far the one-pass
  * need realistically goes before columnar multi-agg takes over); beyond
  * that, results come back positionally as `Seq[Any]`. */
case class AlgAll[A](algs: Seq[Alg[A, _]]) extends Alg[A, Seq[Any]] {
  def zero: Seq[Any] = algs.map(_.zero)
  def init(x: A): Seq[Any] = algs.map(_.init(x))
  def plus(x: Seq[Any], y: Seq[Any]): Seq[Any] =
    algs.lazyZip(x).lazyZip(y).map((a, xi, yi) =>
      a.asInstanceOf[Alg[A, Any]].plus(xi, yi))
}

/** Fused monad algebras: push map/flatMap/filter into a fold (one pass, no
  * intermediate bag). Mirrors reference Alg.Map/FlatMap/WithFilter semantics. */
case class MapAlg[A, B, C](f: A => B, alg: Alg[B, C]) extends Alg[A, C] {
  def zero: C = alg.zero
  def init(x: A): C = alg.init(f(x))
  def plus(x: C, y: C): C = alg.plus(x, y)
}

case class FlatMapAlg[A, B, C](f: A => IterableOnce[B], alg: Alg[B, C]) extends Alg[A, C] {
  def zero: C = alg.zero
  def init(x: A): C = f(x).iterator.foldLeft(alg.zero)((c, b) => alg.plus(c, alg.init(b)))
  def plus(x: C, y: C): C = alg.plus(x, y)
}

case class WithFilterAlg[A, B](p: A => Boolean, alg: Alg[A, B]) extends Alg[A, B] {
  def zero: B = alg.zero
  def init(x: A): B = if (p(x)) alg.init(x) else alg.zero
  def plus(x: B, y: B): B = alg.plus(x, y)
}
