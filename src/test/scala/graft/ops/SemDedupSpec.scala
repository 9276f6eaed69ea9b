package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** SemDeDup: planted duplicate groups are collapsed to their min-id
  * representative; distant vectors survive untouched. */
class SemDedupSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // ids 1-3 span the three base directions (kMeans seeds centroids from the
  // first k ids, so each direction gets its own cluster); 4-6 are planted
  // near-copies, 7 is an off-axis singleton
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1f, 0f, 0f, 0f),
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(0f, 0f, 1f, 0f),
    4L -> Seq(0.999f, 0.04f, 0f, 0f),   // near-dup of 1
    5L -> Seq(2f, 0.01f, 0f, 0f),       // near-dup of 1 and 4 (scaled)
    6L -> Seq(0f, 0.998f, 0.06f, 0f),   // near-dup of 2
    7L -> Seq(0f, 0f, 0f, 1f)           // singleton
  )

  "SemDedup.semDedup" should "collapse planted groups to min-id reps and keep singletons" in {
    val out = SemDedup.semDedup(vecs.toDF("vec_id", "embedding"),
        minCos = 0.99, nClusters = 3, maxIter = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    out(1L) shouldBe ((1L, true))
    out(2L) shouldBe ((2L, true))
    out(3L) shouldBe ((3L, true))
    out(4L) shouldBe ((1L, false))
    out(5L) shouldBe ((1L, false))
    out(6L) shouldBe ((2L, false))
    out(7L) shouldBe ((7L, true))
  }

  it should "keep everything when the threshold exceeds all pairwise similarity" in {
    val out = SemDedup.semDedup(vecs.toDF("vec_id", "embedding"),
        minCos = 1.0000001, nClusters = 2, maxIter = 4).collect()
    out.length shouldBe vecs.length
    all(out.map(_.getBoolean(3))) shouldBe true
  }

  it should "not let a zero-norm vector (cosine NaN) collapse its cluster" in {
    // NaN >= minCos is TRUE under Spark's nan-safe ordering — without the
    // guard, vec 8 would near-dup everything kMeans co-clusters with it
    val withZero = (vecs :+ (8L -> Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(withZero, minCos = 0.99, nClusters = 3, maxIter = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    out(8L) shouldBe ((8L, true)) // the zero vector is near nothing
    out(4L) shouldBe ((1L, false)) // and real groups are untouched
    out(7L) shouldBe ((7L, true))
  }

  it should "partition the corpus: every id exactly once, reps are kept ids" in {
    val out = SemDedup.semDedup(vecs.toDF("vec_id", "embedding"),
      minCos = 0.99, nClusters = 2, maxIter = 4)
    out.count() shouldBe vecs.length
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val kept = rows.filter(_._3).map(_._1).toSet
    rows.foreach { case (_, rep, _) => kept should contain(rep) }
    rows.foreach { case (id, rep, keep) => if (keep) rep shouldBe id else rep should be < id }
  }
}
