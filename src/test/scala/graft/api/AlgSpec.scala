package graft.api

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.api.alg._

/** Pure (driver-side) laws of the fold algebras — mirrors the semantics the
  * reference pins in its DataBagSpec fold section. */
class AlgSpec extends AnyFlatSpec with Matchers {

  private def runFold[A, B](xs: Seq[A], alg: Alg[A, B]): B =
    xs.foldLeft(alg.zero)((b, a) => alg.plus(b, alg.init(a)))

  private val xs = Seq(4, 1, 3, 2, 4)

  "Size" should "count" in { runFold(xs, Size) shouldBe 5L }
  "Count" should "count matches" in { runFold(xs, Count[Int](_ > 2)) shouldBe 3L }
  "Sum" should "sum" in { runFold(xs, Sum(implicitly[Numeric[Int]])) shouldBe 14 }

  it should "raise on integral overflow like the ANSI agg path (never wrap)" in {
    // the object-fold path must agree with the ANSI-checked Catalyst
    // HashAggregate the columnar fast path routes to — the result must not
    // depend on whether an AutoCache scope rerouted the fold
    an[ArithmeticException] should be thrownBy
      runFold(Seq(Long.MaxValue, 1L), Sum(implicitly[Numeric[Long]]))
    an[ArithmeticException] should be thrownBy
      runFold(Seq(Int.MaxValue, 1), Sum(implicitly[Numeric[Int]]))
    // non-integral numerics keep plain accumulation
    runFold(Seq(1.5, 2.5), Sum(implicitly[Numeric[Double]])) shouldBe 4.0
  }
  "Product" should "multiply" in { runFold(xs, Product(implicitly[Numeric[Int]])) shouldBe 96 }
  "Min/Max" should "find extrema, None on empty" in {
    runFold(xs, Min(Ordering.Int)) shouldBe Some(1)
    runFold(xs, Max(Ordering.Int)) shouldBe Some(4)
    runFold(Seq.empty[Int], Min(Ordering.Int)) shouldBe None
  }
  "Exists/Forall" should "short-circuit logic" in {
    runFold(xs, Exists[Int](_ > 3)) shouldBe true
    runFold(xs, Forall[Int](_ > 0)) shouldBe true
    runFold(xs, Forall[Int](_ > 1)) shouldBe false
    runFold(Seq.empty[Int], Exists[Int](_ => true)) shouldBe false
    runFold(Seq.empty[Int], Forall[Int](_ => false)) shouldBe true
  }
  "IsEmpty/NonEmpty" should "detect emptiness" in {
    runFold(xs, IsEmpty) shouldBe false
    runFold(Seq.empty[Int], IsEmpty) shouldBe true
    runFold(xs, NonEmpty) shouldBe true
  }
  "Top/Bottom" should "keep sorted k" in {
    runFold(xs, Top(2, Ordering.Int)) shouldBe List(4, 4)
    runFold(xs, Bottom(3, Ordering.Int)) shouldBe List(1, 2, 3)
    runFold(xs, Bottom(10, Ordering.Int)) shouldBe List(1, 2, 3, 4, 4)
  }
  "ReduceOpt" should "be None on empty" in {
    runFold(Seq.empty[Int], ReduceOpt[Int](_ + _)) shouldBe None
    runFold(xs, ReduceOpt[Int](_ + _)) shouldBe Some(14)
  }
  "Find" should "find a match" in {
    runFold(xs, Find[Int](_ == 3)) shouldBe Some(3)
    runFold(xs, Find[Int](_ == 9)) shouldBe None
  }
  "Alg2/Alg3" should "fuse independent folds" in {
    runFold(xs, Alg2(Size, Sum(implicitly[Numeric[Int]]))) shouldBe ((5L, 14))
    runFold(xs, Alg3(Size, Min(Ordering.Int), Max(Ordering.Int))) shouldBe
      ((5L, Some(1), Some(4)))
  }
  "Alg8" should "fuse eight independent folds in one pass, matching Seq oracles" in {
    val num = implicitly[Numeric[Int]]
    runFold(xs, Alg8(Size, Sum(num), Min(Ordering.Int), Max(Ordering.Int),
      Count[Int](_ > 2), Product(num), Top(2, Ordering.Int), Exists[Int](_ == 3))) shouldBe
      ((xs.size.toLong, xs.sum, Some(xs.min), Some(xs.max),
        xs.count(_ > 2).toLong, xs.product, xs.sorted.reverse.take(2), xs.contains(3)))
    runFold(xs, Alg5(Size, Sum(num), Min(Ordering.Int), Max(Ordering.Int),
      Count[Int](_ > 2))) shouldBe
      ((5L, 14, Some(1), Some(4), 3L))
    runFold(xs, Alg6(Size, Sum(num), Min(Ordering.Int), Max(Ordering.Int),
      Count[Int](_ > 2), Product(num))) shouldBe
      ((5L, 14, Some(1), Some(4), 3L, 96))
    runFold(xs, Alg7(Size, Sum(num), Min(Ordering.Int), Max(Ordering.Int),
      Count[Int](_ > 2), Product(num), IsEmpty)) shouldBe
      ((5L, 14, Some(1), Some(4), 3L, 96, false))
  }
  "AlgAll" should "run arbitrary-arity one-pass folds positionally" in {
    val num = implicitly[Numeric[Int]]
    val algs: Seq[Alg[Int, _]] = Seq(Size, Sum(num), Min(Ordering.Int),
      Max(Ordering.Int), Count[Int](_ > 2), Product(num), Top(2, Ordering.Int),
      Exists[Int](_ == 3), IsEmpty, Bottom(2, Ordering.Int))
    runFold(xs, AlgAll(algs)) shouldBe Seq(5L, 14, Some(1), Some(4), 3L, 96,
      List(4, 4), true, false, List(1, 2))
    runFold(Seq.empty[Int], AlgAll(algs)) shouldBe Seq(0L, 0, None, None, 0L, 1,
      Nil, false, true, Nil)
  }
  "MapAlg/FlatMapAlg/WithFilterAlg" should "fuse monad ops into folds" in {
    runFold(xs, MapAlg[Int, Long, Long](_.toLong * 2, Sum(implicitly[Numeric[Long]]))) shouldBe 28L
    runFold(xs, WithFilterAlg[Int, Long](_ > 2, Count[Int](_ => true))) shouldBe 3L
    runFold(Seq("a b", "c"), FlatMapAlg[String, String, Long](_.split(" "), Size)) shouldBe 3L
  }
  "plus" should "be associative and commutative with zero identity (Sum/Min/Top)" in {
    val algs: Seq[Alg[Int, _]] =
      Seq(Sum(implicitly[Numeric[Int]]), Min(Ordering.Int), Top(3, Ordering.Int), Size)
    for (alg0 <- algs) {
      val alg = alg0.asInstanceOf[Alg[Int, Any]]
      val parts = xs.map(alg.init)
      val l2r = parts.foldLeft(alg.zero)(alg.plus)
      val r2l = parts.foldRight(alg.zero)((a, b) => alg.plus(b, a))
      val split = alg.plus(
        parts.take(2).foldLeft(alg.zero)(alg.plus),
        parts.drop(2).foldLeft(alg.zero)(alg.plus))
      l2r shouldBe r2l
      l2r shouldBe split
      alg.plus(alg.zero, l2r) shouldBe l2r
    }
  }

  "AlgAggregator" should "run any Alg as a typed-column UDAF with partial aggregation" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val ds = Seq(("a", 3L), ("b", 5L), ("a", 4L), ("b", 1L), ("a", 2L)).toDS()
    // global fold as a TypedColumn
    ds.map(_._2).select(AlgAggregator.column(Sum(implicitly[Numeric[Long]]))).head() shouldBe 15L
    // grouped fold through the standard KeyValueGroupedDataset.agg surface
    val perKey = ds.groupByKey(_._1)
      .agg(AlgAggregator.column(Fold[(String, Long), Long](0L, _._2, _ + _)))
      .collect().toMap
    perKey shouldBe Map("a" -> 9L, "b" -> 6L)
    // min-by-arbitrary-Ordering (SURVEY §7.4's flagged case)
    val minByOrd = ds.groupByKey(_._1)
      .agg(AlgAggregator.column(
        ReduceOpt[(String, Long)]((x, y) => if (x._2 <= y._2) x else y)))
      .collect().toMap
    minByOrd("a") shouldBe Some(("a", 2L))
    minByOrd("b") shouldBe Some(("b", 1L))
  }
}
