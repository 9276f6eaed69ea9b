package graft.api

import graft.api.alg._

/** Local Seq-backed bag — the reference's `ScalaSeq` backend
  * (emma-language api/ScalaSeq.scala:22-109): the identical bag surface over
  * an in-memory collection, SERIALIZABLE and usable inside closures where a
  * Dataset cannot go (SURVEY §7.4 "nested DataBag in closures" — the
  * reference's own tests comprehend over a local bag inside `flatMap`,
  * DataBagSpec.scala:186-199).
  *
  * Every fold delegates to the same [[Alg]] algebras as the distributed
  * [[DataBag]], so a function written against this surface computes the same
  * value whether it runs on the driver, inside an executor closure, or is
  * re-pointed at a Dataset-backed bag.
  */
final class LocalBag[A](val values: Seq[A]) extends Serializable {

  // ---------------------------------------------------------------- monad ops
  def map[B](f: A => B): LocalBag[B] = new LocalBag(values.map(f))
  def flatMap[B](f: A => LocalBag[B]): LocalBag[B] =
    new LocalBag(values.flatMap(f(_).values))
  def withFilter(p: A => Boolean): LocalBag[A] = new LocalBag(values.filter(p))
  def filter(p: A => Boolean): LocalBag[A] = withFilter(p)

  // -------------------------------------------------------------------- folds
  def fold[B](alg: Alg[A, B]): B =
    values.foldLeft(alg.zero)((b, a) => alg.plus(b, alg.init(a)))
  def fold[B](zero: B)(init: A => B, plus: (B, B) => B): B =
    fold(Fold(zero, init, plus))

  def reduce(zero: A)(p: (A, A) => A): A = fold(Reduce(zero, p))
  def reduceOption(p: (A, A) => A): Option[A] = fold(ReduceOpt(p))
  def isEmpty: Boolean = values.isEmpty
  def nonEmpty: Boolean = values.nonEmpty
  def size: Long = values.size.toLong
  def count(p: A => Boolean): Long = values.count(p).toLong
  def min(implicit ord: Ordering[A]): A = fold(Min(ord)).get
  def max(implicit ord: Ordering[A]): A = fold(Max(ord)).get
  def minBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Min(Ordering.by(k)))
  def maxBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Max(Ordering.by(k)))
  def sum(implicit num: Numeric[A]): A = fold(Sum(num))
  def product(implicit num: Numeric[A]): A = fold(Product(num))
  def exists(p: A => Boolean): Boolean = values.exists(p)
  def forall(p: A => Boolean): Boolean = values.forall(p)
  def find(p: A => Boolean): Option[A] = values.find(p)
  def bottom(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Bottom(n, ord))
  def top(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Top(n, ord))

  // ------------------------------------------------- grouping / set ops
  def groupBy[K](k: A => K): LocalBag[Group[K, LocalBag[A]]] =
    new LocalBag(values.groupBy(k).toSeq.map { case (key, vs) =>
      Group(key, new LocalBag(vs))
    })
  def foldGroup[K, B](k: A => K, alg: Alg[A, B]): LocalBag[Group[K, B]] =
    new LocalBag(values.groupBy(k).toSeq.map { case (key, vs) =>
      Group(key, new LocalBag(vs).fold(alg))
    })

  def union(that: LocalBag[A]): LocalBag[A] = new LocalBag(values ++ that.values)
  def distinct: LocalBag[A] = new LocalBag(values.distinct)

  // --------------------------------------------------------------- conversion
  def collect(): Seq[A] = values
  override def toString: String = values.mkString("LocalBag(", ", ", ")")

  /** Bag equality (multiset semantics, like the reference's DataBag#equals). */
  override def equals(o: Any): Boolean = o match {
    case that: LocalBag[_] =>
      values.groupBy(identity).view.mapValues(_.size).toMap ==
        that.values.groupBy(identity).view.mapValues(_.size).toMap
    case _ => false
  }
  override def hashCode: Int =
    values.groupBy(identity).view.mapValues(_.size).toMap.hashCode
}

object LocalBag {
  def empty[A]: LocalBag[A] = new LocalBag(Seq.empty)
  def apply[A](values: A*): LocalBag[A] = new LocalBag(values.toSeq)
  def of[A](values: Seq[A]): LocalBag[A] = new LocalBag(values)
}
