package graft.api

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.api.alg._

/** Property-style fold laws (the reference's DataBagSpec uses ScalaCheck the
  * same way; here: 200 seeded random trials): for random data and random
  * splits, partitioned folding agrees with sequential folding — the exact
  * property Spark's partition-parallel execution relies on. */
class AlgPropertySpec extends AnyFlatSpec with Matchers {

  private def seqFold[A, B](xs: Seq[A], alg: Alg[A, B]): B =
    xs.foldLeft(alg.zero)((b, a) => alg.plus(b, alg.init(a)))

  private def partitionedFold[A, B](xs: Seq[A], alg: Alg[A, B], splits: Int): B =
    xs.grouped(math.max(1, xs.size / math.max(1, splits)))
      .map(part => seqFold(part, alg))
      .foldLeft(alg.zero)(alg.plus)

  private val algs: Seq[(String, Alg[Int, _])] = Seq(
    "Size" -> Size,
    "Sum" -> Sum(implicitly[Numeric[Int]]),
    "Min" -> Min(Ordering.Int),
    "Max" -> Max(Ordering.Int),
    "Count(_%2==0)" -> Count[Int](_ % 2 == 0),
    "Exists(>100)" -> Exists[Int](_ > 100),
    "Forall(>MinValue)" -> Forall[Int](_ > Int.MinValue),
    "Top(5)" -> Top(5, Ordering.Int),
    "Bottom(5)" -> Bottom(5, Ordering.Int),
    "ReduceOpt(+)" -> ReduceOpt[Int](_ + _),
    "Alg2(Size,Sum)" -> Alg2(Size, Sum(implicitly[Numeric[Int]])))

  "every algebra" should "give the same result folded sequentially or over any partitioning" in {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(50))(rnd.nextInt(2001) - 1000)
      val splits = 1 + rnd.nextInt(8)
      algs.foreach { case (name, alg0) =>
        val alg = alg0.asInstanceOf[Alg[Int, Any]]
        withClue(s"$name on $xs split $splits: ") {
          partitionedFold(xs, alg, splits) shouldBe seqFold(xs, alg)
        }
      }
    }
  }

  "WithFilterAlg and MapAlg" should "commute with Seq filter/map" in {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(40))(rnd.nextInt(201) - 100)
      seqFold(xs, WithFilterAlg[Int, Long](_ > 0, Count[Int](_ => true))) shouldBe
        xs.count(_ > 0).toLong
      seqFold(xs, MapAlg[Int, Long, Long](_.toLong * 3,
        Sum(implicitly[Numeric[Long]]))) shouldBe xs.map(_.toLong * 3).sum
    }
  }
}
