package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders, ToAgnosticEncoder}
import org.apache.spark.storage.StorageLevel

import scala.reflect.ClassTag

import graft.api.alg._

/** A homogeneous distributed bag (unordered, duplicates allowed) backed by a
  * Spark `Dataset[A]`.
  *
  * This is the Spark-native re-expression of the reference's `DataBag[A]`
  * algebra (emma-language api/DataBag.scala:25-366): monad ops, structural
  * recursion over commutative monoids ([[graft.api.alg.Alg]]), grouping with
  * fused per-group folds, equi/cross/outer joins, set ops, deterministic
  * sampling and indexing, CSV/Parquet/text IO.
  *
  * Design stance (SURVEY.md §7.1): no macros — where the reference recovers
  * relational structure from quoted lambdas, this API *requests* structure:
  * every op has a typed-lambda form and, where it matters for Catalyst
  * (filter/project/join keys), a `Column` fast path so predicate pushdown,
  * column pruning and whole-stage codegen apply.
  */
final class DataBag[A](val ds: Dataset[A]) extends Serializable {

  private implicit def enc: Encoder[A] = ds.encoder

  /** Consumption seam: reports this bag to an active [[AutoCache]] scope
    * (no-op otherwise) so multiply-consumed bags get persisted. */
  private def src: Dataset[A] = { AutoCache.touched(this); ds }

  def spark: SparkSession = ds.sparkSession

  // ---------------------------------------------------------------- monad ops

  /** Typed projection. Prefer [[select]]/[[project]] when the mapping is columnar. */
  def map[B: Encoder](f: A => B): DataBag[B] = new DataBag(src.map(f))

  /** Monadic bind; the inner collection is local (reference semantics:
    * SparkRDD.scala:55-56 — inner bags are local per element). */
  def flatMap[B: Encoder](f: A => IterableOnce[B]): DataBag[B] =
    new DataBag(src.flatMap(f))

  /** Reference-shaped bind whose inner bag is DISTRIBUTED — the overload
    * that makes `for { x <- xs; y <- ys; ... }` typecheck, exactly like
    * the reference API. Only meaningful under
    * [[graft.api.comprehensions.onSpark]], which rewrites the
    * comprehension into `equiJoin`/`cross` at COMPILE time; reaching this
    * body means no rewrite happened, and evaluating one Spark job per left
    * element is the silent disaster this error prevents (the reference has
    * the same cliff: its un-specialized nested bags are local-only). */
  def flatMap[B](f: A => DataBag[B]): DataBag[B] =
    throw new UnsupportedOperationException(
      "flatMap with a distributed inner bag executes one job per element. " +
      "Wrap the comprehension in graft.api.comprehensions.onSpark{} (compile-time " +
      "rewrite to equiJoin/cross), or use flatMapBag for LOCAL inner bags.")

  /** For-comprehension filter. Prefer [[where]] for Column predicates. */
  def withFilter(p: A => Boolean): DataBag[A] = new DataBag(src.filter(p))
  def filter(p: A => Boolean): DataBag[A] = withFilter(p)

  // ------------------------------------------------- Column fast paths (§4.5)
  // The reference compiles whitelisted lambdas to Catalyst expressions
  // (SparkSpecializeOps.scala:36-130); we expose the Column form directly so
  // pushdown / pruning / whole-stage codegen apply without any analysis.

  /** Catalyst-native filter. */
  def where(cond: Column): DataBag[A] = new DataBag(src.filter(cond))

  /** [[Expr]]-DSL filter (lowers to a Column — pushdown applies). */
  def where(e: Expr): DataBag[A] = where(e.col)

  /** [[Expr]]-DSL projection into a typed bag. A top-level Struct projects
    * its fields as top-level columns (what a product encoder expects). */
  def project[B: Encoder](e: Expr): DataBag[B] = e match {
    case Expr.Struct(fields) =>
      new DataBag(src.select(fields.map { case (n, x) => x.col.as(n) }: _*).as[B])
    case other => new DataBag(src.select(other.col).as[B])
  }

  /** Catalyst-native projection to an untyped frame. */
  def select(cols: Column*): DataFrame = src.select(cols: _*)

  /** Catalyst-native projection back into a typed bag. */
  def project[B: Encoder](cols: Column*): DataBag[B] =
    new DataBag(src.select(cols: _*).as[B])

  def toDF: DataFrame = ds.toDF()

  // ------------------------------------------------------------------- folds

  /** Structural recursion over a commutative monoid: executes as map-side
    * partial aggregation per partition, then a driver-side combine of one
    * value per partition (same physics as the reference's
    * `rdd.map(alg.init).fold(alg.zero)(alg.plus)`, SparkRDD.scala:45-46).
    * Inside an [[AutoCache.scope]], plain folds route through the scope's
    * fold-forest batch (memoized by algebra value; joins any pending
    * `deferFold`s; `Size` speculated alongside — see
    * [[AutoCache.Scope.namedFold]]); outside, they run directly. */
  def fold[B](alg: Alg[A, B]): B =
    AutoCache.foldThrough(this, alg, Seq(Size))(() => foldNow(alg))

  /** The raw fold execution, bypassing the scope hook (the batch runner
    * itself comes through here — reentrancy cut). */
  private[api] def foldNow[B](alg: Alg[A, B]): B = {
    implicit val ct: ClassTag[B] = ClassTag.AnyRef.asInstanceOf[ClassTag[B]]
    src.rdd
      .mapPartitions { it =>
        Iterator.single(it.foldLeft(alg.zero)((b, a) => alg.plus(b, alg.init(a))))
      }
      .collect()
      .foldLeft(alg.zero)(alg.plus)
  }

  def fold[B](zero: B)(init: A => B, plus: (B, B) => B): B =
    fold(Fold(zero, init, plus))

  /** Any number of independent folds in ONE pass over the bag (positional
    * results; use Alg2..Alg8 when tuple types are wanted). Always runs
    * directly — it IS the batch shape. */
  def foldAll(algs: Alg[A, _]*): Seq[Any] = foldNow(AlgAll(algs.toSeq))

  def reduce(zero: A)(p: (A, A) => A): A = fold(Reduce(zero, p))
  def reduceOption(p: (A, A) => A): Option[A] = fold(ReduceOpt(p))
  def isEmpty: Boolean = src.isEmpty
  def nonEmpty: Boolean = !isEmpty
  def size: Long =
    if (AutoCache.isActive) fold(Size) else src.count()
  def count(p: A => Boolean): Long = src.filter(p).count()
  def min(implicit ord: Ordering[A]): A =
    if (AutoCache.isActive)
      AutoCache.foldThrough(this, Min(ord), Seq(Max(ord), Size))(
        () => foldNow(Min(ord))).get
    else extremeViaAgg(F.min, ord).getOrElse(fold(Min(ord)).get)
  def max(implicit ord: Ordering[A]): A =
    if (AutoCache.isActive)
      AutoCache.foldThrough(this, Max(ord), Seq(Min(ord), Size))(
        () => foldNow(Max(ord))).get
    else extremeViaAgg(F.max, ord).getOrElse(fold(Max(ord)).get)
  def minBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Min(Ordering.by(k)))
  def maxBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Max(Ordering.by(k)))
  /** Inside a scope the batch path wins over the columnar fast path: the
    * one object pass fuses with sibling folds and memoizes (exact for the
    * integral types the fast path covers anyway). */
  def sum(implicit num: Numeric[A]): A =
    if (AutoCache.isActive) fold(Sum(num))
    else sumViaAgg.getOrElse(fold(Sum(num)))

  // ------------------------------------- Catalyst fast paths for named folds
  // A bag of one integral column lowers sum/min/max to df.agg — a codegen'd
  // HashAggregate with map-side partials — instead of the generic
  // deserializing RDD fold. Only EXACT-equivalent cases route: integral
  // types (no FP reorder effects) under the NATURAL ordering; everything
  // else (arbitrary Alg, custom Orderings, floating point) keeps the RDD
  // path. Integral overflow raises on BOTH paths: the agg under ANSI mode,
  // the object fold via Sum's Math.addExact — so the result never depends
  // on whether an AutoCache scope rerouted the fold.

  private def integralColumn: Option[String] = {
    import org.apache.spark.sql.types._
    ds.schema.fields match {
      case Array(f) => f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => Some(f.name)
        case _ => None
      }
      case _ => None
    }
  }

  private def isNaturalIntegralOrd(ord: Ordering[_]): Boolean =
    (ord eq Ordering.Byte) || (ord eq Ordering.Short) ||
      (ord eq Ordering.Int) || (ord eq Ordering.Long)

  private def sumViaAgg: Option[A] = integralColumn.map { c =>
    src.select(F.coalesce(F.sum(F.col(c)), F.lit(0L))
        .cast(ds.schema.fields(0).dataType))
      .head().get(0).asInstanceOf[A]
  }

  private def extremeViaAgg(agg: Column => Column, ord: Ordering[_]): Option[A] =
    if (!isNaturalIntegralOrd(ord)) None
    else integralColumn.flatMap { c =>
      val row = src.select(agg(F.col(c))).head()
      if (row.isNullAt(0)) None else Some(row.get(0).asInstanceOf[A])
    }
  def product(implicit num: Numeric[A]): A = fold(Product(num))
  def exists(p: A => Boolean): Boolean = src.filter(p).head(1).nonEmpty
  def forall(p: A => Boolean): Boolean = src.filter(x => !p(x)).head(1).isEmpty
  def find(p: A => Boolean): Option[A] = src.filter(p).head(1).headOption
  def bottom(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Bottom(n, ord))
  def top(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Top(n, ord))

  // ---------------------------------------------------------------- grouping

  /** Nested grouping: materializes each group as a local Seq. This is the
    * fallback form — prefer [[foldGroup]] (fused, partial-aggregating)
    * whenever groups are only folded. The reference performs that rewrite
    * automatically (FoldGroupFusion.scala:49-82); here the fused form is the
    * API's primary path. */
  def groupBy[K: Encoder](k: A => K)(
      implicit encG: Encoder[Group[K, Seq[A]]]): DataBag[Group[K, Seq[A]]] =
    new DataBag(src.groupByKey(k).mapGroups((key, it) => Group(key, it.toSeq)))

  /** Fused group-aggregate (the reference's `foldGroup` combinator,
    * SparkOps.scala:61-68 = reduceByKey): partial (map-side) aggregation,
    * never materializes groups. Size/Sum/Min/Max over a single integral
    * column route to [[foldGroupViaAgg]] (codegen'd HashAggregate);
    * arbitrary algebras keep the object-buffered reduceGroups. */
  def foldGroup[K: Encoder, B: Encoder](k: A => K, alg: Alg[A, B])(
      implicit encG: Encoder[Group[K, B]]): DataBag[Group[K, B]] =
    foldGroupViaAgg(k, alg).getOrElse(new DataBag(
      src.groupByKey(k)
        .mapValues(alg.init)
        .reduceGroups(alg.plus)
        .map { case (key, b) => Group(key, b) }))

  /** Catalyst fast path for the workhorse grouped fold: the named algebras
    * whose combine is a built-in SQL aggregate lower to
    * `groupByKey(k).agg(column)` — a whole-stage-codegen HashAggregate
    * with map-side partials whose only object step is the AppendColumns
    * computing the key — instead of reduceGroups' object-buffered
    * aggregation. The result is renamed columnar (`toDF.as[Group]`), no
    * per-row object round trip. Routing mirrors the global fold fast
    * paths exactly: integral value types under NATURAL orderings/numerics
    * only (no FP reorder effects); anything else returns None. */
  private def foldGroupViaAgg[K: Encoder, B: Encoder](k: A => K, alg: Alg[A, B])(
      implicit encG: Encoder[Group[K, B]]): Option[DataBag[Group[K, B]]] = {
    val aggCol: Option[Column] = alg match {
      case Size => Some(F.count(F.lit(1L)))
      case Sum(num) if isNaturalIntegralNum(num) =>
        integralColumn.map(c => F.sum(F.col(c)).cast(ds.schema(c).dataType))
      case Min(ord) if isNaturalIntegralOrd(ord) =>
        integralColumn.map(c => F.min(F.col(c)))
      case Max(ord) if isNaturalIntegralOrd(ord) =>
        integralColumn.map(c => F.max(F.col(c)))
      case _ => None
    }
    aggCol.map { ac =>
      val typed = ac.as[B](implicitly[Encoder[B]])
        .asInstanceOf[org.apache.spark.sql.TypedColumn[A, B]]
      new DataBag(src.groupByKey(k).agg(typed).toDF("key", "values")
        .as[Group[K, B]])
    }
  }

  private def isNaturalIntegralNum(num: Numeric[_]): Boolean =
    (num eq Numeric.ByteIsIntegral) || (num eq Numeric.ShortIsIntegral) ||
      (num eq Numeric.IntIsIntegral) || (num eq Numeric.LongIsIntegral)

  // --------------------------------------------------------- joins / products

  /** Inner equi-join on extracted keys (reference equiJoin,
    * ComprehensionCombinators.scala:31-33; SparkNtv.scala:60-70). Catalyst
    * picks broadcast/hash/sort-merge on the key columns. */
  def equiJoin[B, K: Encoder](that: DataBag[B])(kx: A => K, ky: B => K): DataBag[(A, B)] = {
    val encK = implicitly[Encoder[K]]
    val encB = that.ds.encoder
    val lt = src.map(x => (kx(x), x))(Encoders.tuple(encK, enc))
    val rt = that.src.map(y => (ky(y), y))(Encoders.tuple(encK, encB))
    implicit val out: Encoder[(A, B)] = Encoders.tuple(enc, encB)
    new DataBag(
      lt.joinWith(rt, lt("_1") <=> rt("_1"), "inner").map(p => (p._1._2, p._2._2)))
  }

  def leftOuterJoin[B, K: Encoder](that: DataBag[B])(kx: A => K, ky: B => K)(
      implicit out: Encoder[(A, Option[B])]): DataBag[(A, Option[B])] = {
    val encK = implicitly[Encoder[K]]
    val encB = that.ds.encoder
    val lt = src.map(x => (kx(x), x))(Encoders.tuple(encK, enc))
    val rt = that.src.map(y => (ky(y), y))(Encoders.tuple(encK, encB))
    new DataBag(
      lt.joinWith(rt, lt("_1") <=> rt("_1"), "left_outer")
        .map(p => (p._1._2, Option(p._2).map(_._2))))
  }

  /** Keys the right side as a single (possibly struct) column so composite
    * key types work — a flat `toDF("_k")` would mis-arity on tuple keys. */
  private def semiAntiJoin[B, K: Encoder](that: DataBag[B], joinType: String)(
      kx: A => K, ky: B => K): DataBag[A] = {
    val encK = implicitly[Encoder[K]]
    val encB = that.ds.encoder
    val tupEnc = Encoders.tuple(encK, enc)
    val lt = src.map(x => (kx(x), x))(tupEnc)
    val rt = that.src.map(y => (ky(y), y))(Encoders.tuple(encK, encB))
    new DataBag(lt.join(rt, lt("_1") <=> rt("_1"), joinType).as(tupEnc).map(_._2))
  }

  def semiJoin[B, K: Encoder](that: DataBag[B])(kx: A => K, ky: B => K): DataBag[A] =
    semiAntiJoin(that, "left_semi")(kx, ky)

  def antiJoin[B, K: Encoder](that: DataBag[B])(kx: A => K, ky: B => K): DataBag[A] =
    semiAntiJoin(that, "left_anti")(kx, ky)

  /** Comprehension-to-join sugar — the reference derives an equi-join from
    * a comprehension guard `kx(x) == ky(y)` (emma-language
    * comprehension/Combination.scala:58-77,723-777); without macros the
    * join is REQUESTED in the comprehension's generator instead:
    * {{{
    * for { (x, y) <- xs.joined(ys).on(_.k, _.k) } yield f(x, y)
    * }}}
    * executes as [[equiJoin]] — never a cross. (Typed-lambda guards on a
    * [[cross]] stay opaque by design stance; the COLUMN form needs no
    * sugar at all — Catalyst itself rewrites a cross filtered on a Column
    * equality into an equi-join, which PlanShapeSpec pins.) */
  def joined[B](that: DataBag[B]): Joined[B] = new Joined(that)

  final class Joined[B] private[DataBag] (that: DataBag[B]) {
    def on[K: Encoder](kx: A => K, ky: B => K): DataBag[(A, B)] =
      equiJoin(that)(kx, ky)
  }

  /** Cartesian product (reference cross, SparkNtv.scala:72-77). `joinWith`
    * already yields `Dataset[(A, B)]` — no trailing object map, so a
    * Column predicate on the result pushes THROUGH into the join and a
    * `cross(..).where(equality)` is rewritten to an equi-join by Catalyst
    * (an identity `.map` here would wall the filter off behind a
    * serialization boundary and pin the nested-loop plan; PlanShapeSpec
    * guards the rewrite). */
  def cross[B](that: DataBag[B]): DataBag[(A, B)] =
    new DataBag(src.joinWith(that.src, F.lit(true), "cross"))

  /** Broadcast hint for the small side of a subsequent join
    * (reference SparkNtv.broadcast, SparkNtv.scala:88-97). */
  def broadcasted: DataBag[A] = new DataBag(F.broadcast(src))

  // ----------------------------------------------------------------- set ops

  /** Bag union — respects duplicates (UNION ALL; api/DataBag.scala:112-122). */
  def union(that: DataBag[A]): DataBag[A] = new DataBag(src.union(that.src))
  def distinct: DataBag[A] = new DataBag(src.distinct())
  /** Reference-absent freebies (SURVEY §2.4). */
  def intersect(that: DataBag[A]): DataBag[A] = new DataBag(src.intersect(that.src))
  def except(that: DataBag[A]): DataBag[A] = new DataBag(src.except(that.src))
  /** MULTISET variants — the true bag algebra for a duplicate-respecting
    * DataBag: element multiplicities subtract / take the minimum, matching
    * SQL EXCEPT ALL / INTERSECT ALL. One shuffle each (hash-partitioned
    * count-compare under the hood). */
  def exceptAll(that: DataBag[A]): DataBag[A] = new DataBag(src.exceptAll(that.src))
  def intersectAll(that: DataBag[A]): DataBag[A] = new DataBag(src.intersectAll(that.src))

  // ----------------------------------------------------------- partition ops

  /** Deterministic k-element random sample — REFERENCE-EXACT draws
    * (SparkRDD.scala:86-107): every element decides its reservoir slot
    * from a [[RanHash]] draw at its own GLOBAL index (`j = RanHash(seed)
    * .at(i).nextLong(i+1)`, keep when `j < k`), partials merge in
    * partition order with later writes winning. Decisions depend only on
    * each element's global index, so the result equals a sequential
    * reservoir pass over the indexed stream (DataBagSpec pins the twin)
    * and same-seed samples match the reference's Spark backend draw for
    * draw. One narrow pass + k·numPartitions driver merge. */
  def sample(k: Int, seed: Long = 5394826801L): Vector[A] = {
    if (k <= 0) return Vector.empty
    implicit val ct: ClassTag[(Int, Array[Option[A]])] =
      ClassTag(classOf[Tuple2[_, _]]).asInstanceOf[ClassTag[(Int, Array[Option[A]])]]
    val partials: Array[(Int, Array[Option[A]])] = src.rdd
      .zipWithIndex()
      .mapPartitionsWithIndex { (pid, it) =>
        val slots = Array.fill(k)(Option.empty[A])
        it.foreach { case (e, i) =>
          if (i < k) slots(i.toInt) = Some(e)
          else {
            val j = RanHash(seed).at(i).nextLong(i + 1)
            if (j < k) slots(j.toInt) = Some(e)
          }
        }
        Iterator.single(pid -> slots)
      }
      .collect()
    partials.sortBy(_._1).map(_._2.toVector)
      .reduceOption { (xs, ys) =>
        // later partitions hold higher indices: their writes win
        xs.lazyZip(ys).map((x, y) => y.orElse(x)).toVector
      }
      .fold(Vector.empty[A])(_.flatten)
  }

  /** Dense unique 0-based index (reference zipWithIndex, SparkRDD.scala:109-110).
    * No total order implied — indices are unique and contiguous. */
  def zipWithIndex(): DataBag[(A, Long)] = {
    implicit val out: Encoder[(A, Long)] = Encoders.tuple(enc, Encoders.scalaLong)
    new DataBag(ds.sparkSession.createDataset(src.rdd.zipWithIndex()))
  }

  // ---------------------------------------------------------------- sinks etc

  def writeCSV(path: String, format: CSV = CSV()): Unit =
    src.write.options(format.writerOptions).mode("overwrite").csv(path)
  def writeText(path: String): Unit =
    src.toDF().write.mode("overwrite").text(path)
  def writeParquet(path: String, format: Parquet = Parquet()): Unit =
    src.write.options(format.options).mode("overwrite").parquet(path)

  def collect(): Seq[A] = src.collect().toSeq

  /** Materialize into the closure-safe local bag (reference ScalaSeq). */
  def local(): LocalBag[A] = new LocalBag(collect())

  /** flatMap whose per-element result is a LOCAL bag — the reference's
    * nested-comprehension shape (a comprehension over a ScalaSeq bag inside
    * `flatMap`, SURVEY §7.4): the inner bag lives entirely inside the
    * closure, so this is a narrow map, no nested distribution. */
  def flatMapBag[B: Encoder](f: A => LocalBag[B]): DataBag[B] =
    flatMap(x => f(x).values)

  /** Escape hatch to the native representation (reference `as[DColl]`). */
  def asDataset: Dataset[A] = ds
  def asRDD: org.apache.spark.rdd.RDD[A] = src.rdd

  /** Multiply-used / loop-carried bags should be cached. The reference inserts
    * this automatically (Caching.scala:74-139); here it is explicit plus the
    * [[graft.api.Iterate]] helper for loops. */
  def cache(): DataBag[A] = new DataBag(ds.persist(StorageLevel.MEMORY_AND_DISK))
  def unpersist(): DataBag[A] = new DataBag(ds.unpersist())

  /** Order-insensitive multiset equality (reference api/DataBag.scala:352-366). */
  def bagEquals(that: DataBag[A]): Boolean = {
    val l = collect().groupBy(identity).view.mapValues(_.size).toMap
    val r = that.collect().groupBy(identity).view.mapValues(_.size).toMap
    l == r
  }
}

object DataBag {

  def empty[A: Encoder](implicit spark: SparkSession): DataBag[A] =
    new DataBag(spark.emptyDataset[A])

  def apply[A: Encoder](values: Seq[A])(implicit spark: SparkSession): DataBag[A] =
    new DataBag(spark.createDataset(values))

  def from[A](ds: Dataset[A]): DataBag[A] = new DataBag(ds)

  def readText(path: String)(implicit spark: SparkSession): DataBag[String] =
    new DataBag(spark.read.textFile(path))

  def readCSV[A: Encoder](path: String, format: CSV = CSV())(
      implicit spark: SparkSession): DataBag[A] =
    new DataBag(
      spark.read.options(format.readerOptions)
        .schema(implicitly[Encoder[A]].schema).csv(path).as[A])

  /** Parquet source with small-input parallelism folded in: a single-file
    * input otherwise scans as ONE partition and every narrow stage after it
    * runs on one core. [[graft.ops.Par.spread]] round-robins such inputs to
    * the default parallelism from a pure planning-time size estimate — a
    * no-op at scale, where the scan already opens in many splits. */
  def readParquet[A: Encoder](path: String, format: Parquet = Parquet())(
      implicit spark: SparkSession): DataBag[A] =
    new DataBag(graft.ops.Par.spread(
      spark.read.schema(implicitly[Encoder[A]].schema).parquet(path)).as[A])

  // --------------------------------------------------------- encoder helpers

  private[graft] def agnostic[T](e: Encoder[T]): AgnosticEncoder[T] = e match {
    case a: AgnosticEncoder[T @unchecked]   => a
    case t: ToAgnosticEncoder[T @unchecked] => t.encoder
    case other => throw new IllegalArgumentException(s"unsupported encoder: $other")
  }

  def optionEncoder[T](e: Encoder[T]): Encoder[Option[T]] =
    AgnosticEncoders.OptionEncoder(agnostic(e))
}
