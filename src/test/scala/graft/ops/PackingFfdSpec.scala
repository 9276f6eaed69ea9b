package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** First-fit-decreasing packing: hand-computed golden, the hard-cap and
  * half-full FFD guarantees under fuzz, bucket-state reset, determinism. */
class PackingFfdSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Packing.packFirstFit"

  it should "match the hand-computed FFD placement" in {
    val docs = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L))
      .toDF("doc_id", "n")
    val got = Packing.packFirstFit(docs, col("doc_id"), col("n"),
        targetTokens = 10L, numBuckets = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    got shouldBe Map(
      1L -> ((0L, 0L)), // 6 opens pack 0
      2L -> ((1L, 0L)), // 5 doesn't fit with 6 → pack 1
      3L -> ((0L, 6L)), // 4 fills pack 0 to 10
      4L -> ((1L, 5L)), // 3 → pack 1 (fill 8)
      5L -> ((1L, 8L))) // 2 fills pack 1 to 10
  }

  it should "give oversized documents their own pack" in {
    val docs = Seq((1L, 25L), (2L, 6L), (3L, 3L)).toDF("doc_id", "n")
    val got = Packing.packFirstFit(docs, col("doc_id"), col("n"), 10L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    got(1L) should not be got(2L) // 25 is alone in its pack
    got(2L) shouldBe got(3L) // 6 + 3 = 9 fits together
  }

  it should "respect the cap and the at-most-one-half-empty guarantee under fuzz" in {
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 until 10) {
      val target = 50L + rnd.nextInt(100)
      val docs = (1L to 300L).map(i => (i, 1L + rnd.nextInt((2 * target).toInt)))
        .toDF("doc_id", "n")
      val asg = Packing.packFirstFit(docs, col("doc_id"), col("n"), target, 4)
      val rows = asg.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      withClue(s"trial $trial target=$target: ") {
        rows.map(_._1).sorted shouldBe (1L to 300L).toArray // each doc once
        val fills = rows.groupBy(r => (r._3, r._4))
          .map { case (bp, rs) => (bp, rs.map(_._2).sum, rs.size) }
        fills.foreach { case ((b, p), fill, m) =>
          assert(fill <= target || m == 1, s"pack ($b,$p) fill $fill with $m docs")
        }
        // at most one pack per bucket below half
        fills.groupBy(_._1._1).foreach { case (b, fs) =>
          val small = fs.count(_._2 < (target + 1) / 2)
          assert(small <= 1, s"bucket $b has $small half-empty packs")
        }
        // offsets are dense prefixes
        rows.groupBy(r => (r._3, r._4)).foreach { case (_, rs) =>
          val sorted = rs.sortBy(_._5)
          sorted.foldLeft(0L) { case (expect, r) =>
            r._5 shouldBe expect
            expect + r._2
          }
        }
      }
    }
  }

  it should "reset state across buckets and stay deterministic" in {
    val docs = (1L to 80L).map(i => (i, 1L + (i * 13 % 40))).toDF("doc_id", "n")
    def run() = Packing.packFirstFit(docs, col("doc_id"), col("n"), 64L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
    val a = run()
    a.map(_._2).distinct.sorted shouldBe (0L until 8L).toArray
    run().toSeq shouldBe a.toSeq
  }
}
