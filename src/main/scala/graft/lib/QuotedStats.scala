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
  * to ONE foldAll job per pass under an AutoCache.scope), and `variance`'s
  * val-bound mean inlines so its second-pass fold hoists too — the
  * pipeline's aggregation collapses to the irreducible two passes. */
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
