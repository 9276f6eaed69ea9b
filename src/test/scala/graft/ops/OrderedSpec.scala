package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Interval merge and skyline vs brute-force references on seeded data. */
class OrderedSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Ordered.mergeIntervals"

  it should "merge overlapping and touching intervals, keep gaps apart" in {
    val iv = Seq(
      ("k", 1L, 5L), ("k", 5L, 7L),    // touching -> merge
      ("k", 3L, 4L),                   // contained
      ("k", 9L, 12L),                  // gap -> new island
      ("z", 1L, 2L)
    ).toDF("k", "s", "e")
    val got = Ordered.mergeIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe Set(("k", 1L, 7L, 3L), ("k", 9L, 12L, 1L), ("z", 1L, 2L, 1L))
  }

  it should "match a brute-force merge on seeded random intervals" in {
    val rnd = new scala.util.Random(7)
    val iv = Seq.fill(500) {
      val s = rnd.nextInt(200).toLong
      (rnd.nextInt(5).toString, s, s + rnd.nextInt(10).toLong)
    }
    def brute(xs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val sorted = xs.sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      for ((s, e) <- sorted) {
        if (out.nonEmpty && s <= out.last._2)
          out(out.size - 1) = (out.last._1, out.last._2 max e, out.last._3 + 1)
        else out += ((s, e, 1L))
      }
      out.toSeq
    }
    val exp = iv.groupBy(_._1).flatMap { case (k, xs) =>
      brute(xs.map(x => (x._2, x._3))).map(t => (k, t._1, t._2, t._3))
    }.toSet
    val got = Ordered.mergeIntervals(iv.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe exp
  }

  behavior of "Ordered.skyline2D"

  def bruteSkyline(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter(p => !pts.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))).toSet

  it should "keep exactly the non-dominated points (incl. duplicates)" in {
    val pts = Seq((1L, 9L), (2L, 7L), (2L, 7L), (3L, 3L), (2L, 6L), (1L, 10L))
    val got = Ordered.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSet shouldBe bruteSkyline(pts)
    // duplicates on the frontier are all kept
    got.count(_ == (2L, 7L)) shouldBe 2
  }

  it should "match brute force on seeded anti-correlated data" in {
    val rnd = new scala.util.Random(99)
    // anti-correlated: long frontier, plenty of x-ties
    val pts = Seq.fill(2000) {
      val x = rnd.nextInt(60).toLong
      (x, 100L - x + rnd.nextInt(8).toLong)
    }
    val got = Ordered.skyline2D(pts.toDF("x", "y"), "x", "y", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe bruteSkyline(pts)
    got.size should be > 10 // the case actually exercises a long frontier
  }
}
