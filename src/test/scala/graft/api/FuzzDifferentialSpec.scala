package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Randomized differential: random pipelines of monad/set ops run on a
  * DataBag and on the plain Seq (the reference's ScalaSeq twin semantics,
  * its own DataBagSpec strategy), then compared under every terminal fold.
  * Seeded — failures reproduce exactly. */
class FuzzDifferentialSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private type Op = (DataBag[Int], Seq[Int]) => (DataBag[Int], Seq[Int])

  private def ops(rnd: scala.util.Random): Seq[(String, Op)] = Seq(
    "map(*k)" -> { val k = rnd.nextInt(5) + 1
      (b, s) => (b.map(_ * k), s.map(_ * k)) },
    "map(+k)" -> { val k = rnd.nextInt(100)
      (b, s) => (b.map(_ + k), s.map(_ + k)) },
    "filter(>k)" -> { val k = rnd.nextInt(50)
      (b, s) => (b.withFilter(_ > k), s.filter(_ > k)) },
    "filter(%m==0)" -> { val m = rnd.nextInt(4) + 2
      (b, s) => (b.withFilter(_ % m == 0), s.filter(_ % m == 0)) },
    "flatMap(dup)" -> ((b, s) =>
      (b.flatMap(x => Seq(x, x % 7)), s.flatMap(x => Seq(x, x % 7)))),
    "distinct" -> ((b, s) => (b.distinct, s.distinct)),
    "union(self-mod)" -> ((b, s) =>
      (b.union(b.map(_ % 13)), s ++ s.map(_ % 13))))

  private def terminalCompare(b: DataBag[Int], s: Seq[Int], ctx: String): Unit = {
    withClue(s"[$ctx] ") {
      b.size shouldBe s.size.toLong
      b.sum shouldBe s.sum
      b.top(3) shouldBe s.sorted.reverse.take(3)
      b.bottom(3) shouldBe s.sorted.take(3)
      b.count(_ % 2 == 0) shouldBe s.count(_ % 2 == 0).toLong
      b.reduceOption(math.max) shouldBe s.reduceOption(math.max)
      b.exists(_ > 90) shouldBe s.exists(_ > 90)
      // grouped fold parity: per-residue (count, sum)
      b.foldGroup[Int, (Long, Int)](_ % 5,
          graft.api.alg.Alg2(graft.api.alg.Size,
            graft.api.alg.Sum(implicitly[Numeric[Int]])))
        .collect().map(g => g.key -> g.values).toMap shouldBe
        s.groupBy(_ % 5).view.mapValues(v => (v.size.toLong, v.sum)).toMap
    }
  }

  "random op pipelines" should "agree with Seq semantics under every terminal fold" in {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 25) {
      val data = Seq.fill(rnd.nextInt(60) + (if (rnd.nextInt(10) == 0) 0 else 1))(
        rnd.nextInt(100))
      var bag: DataBag[Int] = DataBag.from(data.toDS().repartition(4))
      var seq: Seq[Int] = data
      val chosen = Seq.fill(rnd.nextInt(4) + 1)(ops(rnd)(rnd.nextInt(7)))
      for ((_, op) <- chosen) {
        val (b2, s2) = op(bag, seq)
        bag = b2; seq = s2
      }
      terminalCompare(bag, seq,
        s"trial $trial: ${chosen.map(_._1).mkString(" -> ")} over ${data.size} rows")
    }
  }
}
