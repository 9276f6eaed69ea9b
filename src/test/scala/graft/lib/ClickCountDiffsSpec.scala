package graft.lib

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ClickCountDiffsSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "ClickCountDiffs.run" should "compute per-day full-outer diffs" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccd").toString
    // day1: a=2 b=1; day2: a=1 c=2 -> |1-2|+|0-1|+|2-0| = 4
    // day3: a=1 c=2 (same)         -> 0
    Seq("a", "a", "b").toDF("page").write.parquet(s"$dir/in/clicks_1")
    Seq("a", "c", "c").toDF("page").write.parquet(s"$dir/in/clicks_2")
    Seq("a", "c", "c").toDF("page").write.parquet(s"$dir/in/clicks_3")

    val diffs = ClickCountDiffs.run(spark, s"$dir/in", 3, s"$dir/out")
    diffs shouldBe Seq((2, 4L), (3, 0L))
    // per-day counts written
    spark.read.parquet(s"$dir/out/counts_2").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted shouldBe Seq(("a", 1L), ("c", 2L))
  }

  "ClickCountDiffs.diffs" should "match run's loop on in-memory day frames" in {
    val days = Seq(
      1 -> Seq("a", "a", "b").toDF("page"),
      2 -> Seq("a", "c", "c").toDF("page"),
      3 -> Seq("a", "c", "c").toDF("page"))
    ClickCountDiffs.diffs(days) shouldBe Seq((2, 4L), (3, 0L))
    ClickCountDiffs.diffs(days.take(1)) shouldBe Seq.empty
    ClickCountDiffs.diffs(Seq.empty) shouldBe Seq.empty
  }

  "ML.gd with batchFraction" should "still converge on mini-batches" in {
    import org.apache.spark.sql.functions.col
    val data = (0 until 80).map(i => (i.toLong, Array(i / 40.0), 2.0 * (i / 40.0) + 1.0))
      .toDF("id", "x", "y")
    val (w, b, _) = ML.gd(data, dim = 1, lr = 0.8, iters = 150,
      batchFraction = 0.5)
    w(0) shouldBe 2.0 +- 0.3
    b shouldBe 1.0 +- 0.3
  }
}
