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

  "random join pipelines" should "agree with Seq semantics (equiJoin + cross + fold)" in {
    val rnd = new scala.util.Random(777L)
    for (trial <- 1 to 10) {
      val xs = Seq.fill(rnd.nextInt(30) + 1)((rnd.nextInt(8).toLong, rnd.nextInt(100)))
      val ys = Seq.fill(rnd.nextInt(30))((rnd.nextInt(8).toLong, rnd.nextInt(100)))
      val bx = DataBag(xs); val by = DataBag(ys)
      withClue(s"[join trial $trial] ") {
        val j = bx.equiJoin(by)(_._1, _._1).map { case (a, b) => a._2.toLong * b._2 }
        val jSeq = for (a <- xs; b <- ys if a._1 == b._1) yield a._2.toLong * b._2
        j.size shouldBe jSeq.size.toLong
        j.sum shouldBe jSeq.sum
        val c = bx.cross(by).map { case (a, b) => a._2 + b._2 }
        val cSeq = for (a <- xs; b <- ys) yield a._2 + b._2
        c.size shouldBe cSeq.size.toLong
        c.sum shouldBe cSeq.sum
        val semi = bx.semiJoin(by)(_._1, _._1)
        semi.size shouldBe xs.count(a => ys.exists(_._1 == a._1)).toLong
        val anti = bx.antiJoin(by)(_._1, _._1)
        anti.size shouldBe xs.count(a => !ys.exists(_._1 == a._1)).toLong
      }
    }
  }

  "random pipelines on the LocalBag twin" should "agree with both DataBag and Seq" in {
    val rnd = new scala.util.Random(4242L)
    for (trial <- 1 to 10) {
      val data = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(100))
      val k = rnd.nextInt(5) + 1
      val cut = rnd.nextInt(50)
      def run[B](m: Int => Int, bag: Either[LocalBag[Int], DataBag[Int]]): (Long, Int, List[Int]) =
        bag match {
          case Left(lb) =>
            val t = lb.map(m).withFilter(_ > cut)
            (t.size, t.sum, t.top(3))
          case Right(db) =>
            val t = db.map(m).withFilter(_ > cut)
            (t.size, t.sum, t.top(3))
        }
      val m = (x: Int) => x * k % 97
      val local = run(m, Left(LocalBag.of(data)))
      val dist = run(m, Right(DataBag(data)))
      val seqR = {
        val t = data.map(m).filter(_ > cut)
        (t.size.toLong, t.sum, t.sorted.reverse.take(3))
      }
      withClue(s"[local trial $trial] ") {
        local shouldBe seqR
        dist shouldBe seqR
      }
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
