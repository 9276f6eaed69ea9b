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
  */
trait Alg[-A, B] extends Serializable {
  val zero: B
  val init: A => B
  val plus: (B, B) => B
}

case class Fold[A, B](zero: B, init: A => B, plus: (B, B) => B) extends Alg[A, B]

case class Reduce[A](zero: A, p: (A, A) => A) extends Alg[A, A] {
  val init: A => A = identity
  val plus: (A, A) => A = p
}

case class ReduceOpt[A](p: (A, A) => A) extends Alg[A, Option[A]] {
  val zero: Option[A] = None
  val init: A => Option[A] = Some(_)
  val plus: (Option[A], Option[A]) => Option[A] = {
    case (Some(x), Some(y)) => Some(p(x, y))
    case (x, y)             => x.orElse(y)
  }
}

case object IsEmpty extends Alg[Any, Boolean] {
  val zero = true
  val init: Any => Boolean = _ => false
  val plus: (Boolean, Boolean) => Boolean = _ && _
}

case object NonEmpty extends Alg[Any, Boolean] {
  val zero = false
  val init: Any => Boolean = _ => true
  val plus: (Boolean, Boolean) => Boolean = _ || _
}

case object Size extends Alg[Any, Long] {
  val zero = 0L
  val init: Any => Long = _ => 1L
  val plus: (Long, Long) => Long = _ + _
}

case class Count[A](p: A => Boolean) extends Alg[A, Long] {
  val zero = 0L
  val init: A => Long = x => if (p(x)) 1L else 0L
  val plus: (Long, Long) => Long = _ + _
}

case class Min[A](ord: Ordering[A]) extends Alg[A, Option[A]] {
  val zero: Option[A] = None
  val init: A => Option[A] = Some(_)
  val plus: (Option[A], Option[A]) => Option[A] = {
    case (Some(x), Some(y)) => Some(ord.min(x, y))
    case (x, y)             => x.orElse(y)
  }
}

case class Max[A](ord: Ordering[A]) extends Alg[A, Option[A]] {
  val zero: Option[A] = None
  val init: A => Option[A] = Some(_)
  val plus: (Option[A], Option[A]) => Option[A] = {
    case (Some(x), Some(y)) => Some(ord.max(x, y))
    case (x, y)             => x.orElse(y)
  }
}

case class Sum[A](num: Numeric[A]) extends Alg[A, A] {
  val zero: A = num.zero
  val init: A => A = identity
  val plus: (A, A) => A = num.plus
}

case class Product[A](num: Numeric[A]) extends Alg[A, A] {
  val zero: A = num.one
  val init: A => A = identity
  val plus: (A, A) => A = num.times
}

case class Exists[A](p: A => Boolean) extends Alg[A, Boolean] {
  val zero = false
  val init: A => Boolean = p
  val plus: (Boolean, Boolean) => Boolean = _ || _
}

case class Forall[A](p: A => Boolean) extends Alg[A, Boolean] {
  val zero = true
  val init: A => Boolean = p
  val plus: (Boolean, Boolean) => Boolean = _ && _
}

case class Find[A](p: A => Boolean) extends Alg[A, Option[A]] {
  val zero: Option[A] = None
  val init: A => Option[A] = x => Some(x).filter(p)
  val plus: (Option[A], Option[A]) => Option[A] = _ orElse _
}

/** Smallest n elements as a sorted list (merge-based bounded top-k). */
case class Bottom[A](n: Int, ord: Ordering[A]) extends Alg[A, List[A]] {
  val zero: List[A] = Nil
  val init: A => List[A] = x => x :: Nil
  val plus: (List[A], List[A]) => (List[A]) = (xs, ys) => {
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
  val zero: List[A] = bottom.zero
  val init: A => List[A] = bottom.init
  val plus: (List[A], List[A]) => List[A] = bottom.plus
}

/** Product algebra: run two independent folds in one pass (reference Alg2..Alg22;
  * arbitrary arity is recovered by nesting — Spark's multi-column agg subsumes the
  * columnar case, this covers arbitrary Scala monoids). */
case class Alg2[A, B1, B2](a1: Alg[A, B1], a2: Alg[A, B2]) extends Alg[A, (B1, B2)] {
  val zero: (B1, B2) = (a1.zero, a2.zero)
  val init: A => (B1, B2) = x => (a1.init(x), a2.init(x))
  val plus: ((B1, B2), (B1, B2)) => (B1, B2) =
    (x, y) => (a1.plus(x._1, y._1), a2.plus(x._2, y._2))
}

case class Alg3[A, B1, B2, B3](a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3])
    extends Alg[A, (B1, B2, B3)] {
  val zero: (B1, B2, B3) = (a1.zero, a2.zero, a3.zero)
  val init: A => (B1, B2, B3) = x => (a1.init(x), a2.init(x), a3.init(x))
  val plus: ((B1, B2, B3), (B1, B2, B3)) => (B1, B2, B3) =
    (x, y) => (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3))
}

case class Alg4[A, B1, B2, B3, B4](
    a1: Alg[A, B1], a2: Alg[A, B2], a3: Alg[A, B3], a4: Alg[A, B4])
    extends Alg[A, (B1, B2, B3, B4)] {
  val zero: (B1, B2, B3, B4) = (a1.zero, a2.zero, a3.zero, a4.zero)
  val init: A => (B1, B2, B3, B4) = x => (a1.init(x), a2.init(x), a3.init(x), a4.init(x))
  val plus: ((B1, B2, B3, B4), (B1, B2, B3, B4)) => (B1, B2, B3, B4) = (x, y) =>
    (a1.plus(x._1, y._1), a2.plus(x._2, y._2), a3.plus(x._3, y._3), a4.plus(x._4, y._4))
}

/** Fused monad algebras: push map/flatMap/filter into a fold (one pass, no
  * intermediate bag). Mirrors reference Alg.Map/FlatMap/WithFilter semantics. */
case class MapAlg[A, B, C](f: A => B, alg: Alg[B, C]) extends Alg[A, C] {
  val zero: C = alg.zero
  val init: A => C = x => alg.init(f(x))
  val plus: (C, C) => C = alg.plus
}

case class FlatMapAlg[A, B, C](f: A => IterableOnce[B], alg: Alg[B, C]) extends Alg[A, C] {
  val zero: C = alg.zero
  val init: A => C = x => f(x).iterator.foldLeft(alg.zero)((c, b) => alg.plus(c, alg.init(b)))
  val plus: (C, C) => C = alg.plus
}

case class WithFilterAlg[A, B](p: A => Boolean, alg: Alg[A, B]) extends Alg[A, B] {
  val zero: B = alg.zero
  val init: A => B = x => if (p(x)) alg.init(x) else alg.zero
  val plus: (B, B) => B = alg.plus
}
