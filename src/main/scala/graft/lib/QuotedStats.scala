package graft.lib

import graft.api._

/** The reference's statistics module re-expressed for quoted pipelines —
  * `@emma.lib object stat` (emma-lib/.../lib/stats/stat.scala:22-67) ships
  * count/sum/mean/variance/stddev as SCALAR-returning, bag-CONSUMING defs
  * that `Lib.expand` inlines into quoted programs (compiler/lib/
  * Lib.scala:49-51 inlines ANY annotated def regardless of return type);
  * `variance` binds `val means = mean(D)(xs)` before folding the bag a
  * second time (stat.scala:40-55) — the exact shape the macro's
  * ANF-inverse val inlining exists for.
  *
  * Two element types:
  *   - the `Double` members mirror the reference's signatures (its DVector
  *     generalizes to D dimensions; scalars are the 1-D case);
  *   - the `Long` twins (integer-cents pipelines) keep every intermediate
  *     EXACT — parallel-order-free, so a gate over them hash-matches a
  *     DuckDB oracle bit-for-bit (`meanL` is integer division; `stddevL`
  *     is one IEEE sqrt of an exact integer, identical in any engine).
  *
  * When called inside `comprehensions.onSpark`, each member splices at the
  * call site; generator-independent folds hoist into driver vals (fusing
  * to ONE foldAll job per pass under the expansion's self-established
  * AutoCache scope), and `variance`'s val-bound mean inlines so its
  * second-pass fold hoists too — the pipeline's aggregation collapses to
  * the irreducible two passes.
  *
  * PRECONDITION (deliberate, like the reference's `stat` module whose
  * `mean` divides by `count` unguarded, stat.scala:37-38): the mean /
  * variance / stddev members require a NON-EMPTY bag. The `Long` twins
  * raise `ArithmeticException` (division by zero) on an empty bag — at
  * the hoisted driver fold, before any distributed work; the `Double`
  * members yield NaN. Guard with `xs.nonEmpty` at the call site when
  * emptiness is possible. */
@lib object dstat {

  // encoders for the members' OWN (standalone) compilation only — vals, so
  // the object-level walk leaves them untouched; splice sites re-resolve
  // implicits in their own scope (spark.implicits._ at the gates)
  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
  private implicit val doubleEnc: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble

  def count(xs: DataBag[Double]): Long = xs.size

  def sum(xs: DataBag[Double]): Double = xs.sum

  def mean(xs: DataBag[Double]): Double = xs.sum / xs.size

  /** Two-pass population variance — the reference's shape: mean binds to a
    * local val, then the squared deviations fold (stat.scala:40-55). */
  def variance(xs: DataBag[Double]): Double = {
    val mu = mean(xs)
    xs.map(x => (x - mu) * (x - mu)).sum / xs.size
  }

  def stddev(xs: DataBag[Double]): Double = math.sqrt(variance(xs))

  // ------------------------- exact integer twins (cents-style pipelines)

  def sumL(xs: DataBag[Long]): Long = xs.sum

  /** Integer mean (floor for non-negative sums) — exact and
    * parallel-order-free. */
  def meanL(xs: DataBag[Long]): Long = xs.sum / xs.size

  /** Integer two-pass population variance: Σ(x-μ)²/n in exact Long
    * arithmetic (cents deviations up to ~1e7 squared, summed over ~1e5
    * rows, stay far inside Long range). */
  def varianceL(xs: DataBag[Long]): Long = {
    val mu = meanL(xs)
    xs.map(x => (x - mu) * (x - mu)).sum / xs.size
  }

  /** One IEEE sqrt of an exact integer — bit-identical in any engine. */
  def stddevL(xs: DataBag[Long]): Double = math.sqrt(varianceL(xs).toDouble)
}

/** The reference's DVector statistics ALGEBRAS (`salg.scala:31-48` —
  * componentwise vector monoids consumed by `stat.sum/min/max` through
  * `xs.fold(salg.Sum(D))`), re-expressed over EXACT micro-unit vectors:
  * `Array[Long]` keeps every componentwise sum parallel-order-free, so a
  * quoted vector-stats pipeline hash-matches an engine-independent
  * oracle (the reference's `DVector` doubles would drift with partition
  * order). Overflow raises (Math.addExact) like the scalar Sum algebra. */
object valg {

  /** Componentwise vector sum — the `salg.Sum(D)` monoid. */
  final case class VSum(d: Int) extends graft.api.alg.Alg[Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.ofDim[Long](d)
    def init(x: Array[Long]): Array[Long] = x
    def plus(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = Array.ofDim[Long](d)
      var i = 0
      while (i < d) { out(i) = Math.addExact(a(i), b(i)); i += 1 }
      out
    }
  }

  /** Componentwise minimum — `salg.Min(D)`. */
  final case class VMin(d: Int) extends graft.api.alg.Alg[Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(d)(Long.MaxValue)
    def init(x: Array[Long]): Array[Long] = x
    def plus(a: Array[Long], b: Array[Long]): Array[Long] =
      Array.tabulate(d)(i => math.min(a(i), b(i)))
  }

  /** Componentwise maximum — `salg.Max(D)`. */
  final case class VMax(d: Int) extends graft.api.alg.Alg[Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(d)(Long.MinValue)
    def init(x: Array[Long]): Array[Long] = x
    def plus(a: Array[Long], b: Array[Long]): Array[Long] =
      Array.tabulate(d)(i => math.max(a(i), b(i)))
  }
}

/** The reference's VECTOR statistics module — `@emma.lib object stat`
  * over `DVector` (emma-lib/.../stats/stat.scala:23-67: `sum(D)(xs) =
  * xs.fold(salg.Sum(D))`, `mean = sum * (1/count)`, two-pass
  * `variance`) — re-expressed over exact micro-unit vectors. Every
  * member is a SCALAR-or-array-returning bag consumer: quoted calls
  * splice, their `fold`/`size` anchors hoist (fusing under an
  * AutoCache scope), and `variance`'s `val mu = mean(d)(xs)` binding
  * inlines through the ANF-inverse pass once its folds are hoisted —
  * the same derivation chain as the reference's Core normalization +
  * FoldForestFusion. Integer division truncates toward zero on BOTH
  * engines (Scala `/` and DuckDB's integer `//` — measured: -7//2 = -3
  * there), so negative-sum dims divide identically.
  *
  * PRECONDITION (deliberate — see [[dstat]]): `mean` and `variance`
  * require a NON-EMPTY bag (ArithmeticException at the hoisted driver
  * fold otherwise); `min`/`max` of an empty bag return the monoid zeros
  * (Long.MaxValue / Long.MinValue per dim). */
@lib object vstat {

  // encoder for the members' OWN (standalone) compilation only; splice
  // sites re-resolve implicits in their own scope
  private implicit val vecEnc: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  def count(xs: DataBag[Array[Long]]): Long = xs.size

  def sum(d: Int)(xs: DataBag[Array[Long]]): Array[Long] =
    xs.fold(graft.lib.valg.VSum(d))

  def min(d: Int)(xs: DataBag[Array[Long]]): Array[Long] =
    xs.fold(graft.lib.valg.VMin(d))

  def max(d: Int)(xs: DataBag[Array[Long]]): Array[Long] =
    xs.fold(graft.lib.valg.VMax(d))

  /** Componentwise integer mean (exact; truncating division — the
    * semantics DuckDB's integer `//` shares). */
  def mean(d: Int)(xs: DataBag[Array[Long]]): Array[Long] = {
    val s = sum(d)(xs)
    val n = count(xs)
    Array.tabulate(d)(i => s(i) / n)
  }

  /** Two-pass componentwise population variance — the reference's shape
    * (stat.scala:40-55: mean binds to a local val, then the squared
    * deviations fold through the same vector-sum monoid). */
  def variance(d: Int)(xs: DataBag[Array[Long]]): Array[Long] = {
    val mu = mean(d)(xs)
    val s2 = xs.map(x => Array.tabulate(d)(i =>
      (x(i) - mu(i)) * (x(i) - mu(i)))).fold(graft.lib.valg.VSum(d))
    val n = count(xs)
    Array.tabulate(d)(i => s2(i) / n)
  }
}

/** The reference's HIGHER-ORDER statistics aggregator — `@emma.lib object
  * summarize` (emma-lib/.../lib/stats/summarize.scala:22-67): N
  * overloads taking FUNCTION-valued statistic parameters
  * (`s1: DataBag[DVector] => B1, ...`) plus the bag, returning the tuple
  * `(s1(xs), ..., sN(xs))`. The reference relies on `Lib.expand` + beta
  * reduction so the lambdas' folds land in ONE fused pass — its
  * user-facing "N statistics, one job" API. The graft twin is generic in
  * the element type `A` (the reference's `DVector` is one instance);
  * quoted calls splice, function-literal / eta-expanded-`@lib`-member
  * arguments beta-reduce into the body (an OPAQUE runtime function value
  * aborts with guidance), and the reduced statistics' folds hoist and
  * fuse under the expansion's self-established AutoCache scope — so
  * `summarize(dstat.meanL _, dstat.sumL _)(xs)` costs one foldAll job.
  *
  * Outside a quote each overload is an ordinary function application —
  * N statistics, N jobs — exactly like the reference run un-expanded. */
@lib object summarize {

  def apply[A, B](
    s: DataBag[A] => B
  )(xs: DataBag[A]): B =
    s(xs)

  def apply[A, B1, B2](
    s1: DataBag[A] => B1,
    s2: DataBag[A] => B2
  )(xs: DataBag[A]): (B1, B2) = (
    s1(xs), s2(xs)
  )

  def apply[A, B1, B2, B3](
    s1: DataBag[A] => B1,
    s2: DataBag[A] => B2,
    s3: DataBag[A] => B3
  )(xs: DataBag[A]): (B1, B2, B3) = (
    s1(xs), s2(xs), s3(xs)
  )

  def apply[A, B1, B2, B3, B4](
    s1: DataBag[A] => B1,
    s2: DataBag[A] => B2,
    s3: DataBag[A] => B3,
    s4: DataBag[A] => B4
  )(xs: DataBag[A]): (B1, B2, B3, B4) = (
    s1(xs), s2(xs), s3(xs), s4(xs)
  )

  def apply[A, B1, B2, B3, B4, B5](
    s1: DataBag[A] => B1,
    s2: DataBag[A] => B2,
    s3: DataBag[A] => B3,
    s4: DataBag[A] => B4,
    s5: DataBag[A] => B5
  )(xs: DataBag[A]): (B1, B2, B3, B4, B5) = (
    s1(xs), s2(xs), s3(xs), s4(xs), s5(xs)
  )

  def apply[A, B1, B2, B3, B4, B5, B6](
    s1: DataBag[A] => B1,
    s2: DataBag[A] => B2,
    s3: DataBag[A] => B3,
    s4: DataBag[A] => B4,
    s5: DataBag[A] => B5,
    s6: DataBag[A] => B6
  )(xs: DataBag[A]): (B1, B2, B3, B4, B5, B6) = (
    s1(xs), s2(xs), s3(xs), s4(xs), s5(xs), s6(xs)
  )
}
