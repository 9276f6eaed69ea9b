package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.alg._

/** The closure-safe local bag: fold parity with the distributed bag and the
  * reference's nested-comprehension-in-flatMap shape. */
class LocalBagSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val xs = Seq(3, 1, 4, 1, 5, 9, 2, 6)

  "LocalBag folds" should "agree with DataBag folds on the same Alg algebras" in {
    val local = LocalBag.of(xs)
    val dist = new DataBag(spark.createDataset(xs))
    local.size shouldBe dist.size
    local.sum shouldBe dist.sum
    local.min shouldBe dist.min
    local.max shouldBe dist.max
    local.count(_ % 2 == 0) shouldBe dist.count(_ % 2 == 0)
    local.top(3) shouldBe dist.top(3)
    local.bottom(3) shouldBe dist.bottom(3)
    local.exists(_ > 8) shouldBe dist.exists(_ > 8)
    local.forall(_ > 0) shouldBe dist.forall(_ > 0)
    local.reduceOption(_ + _) shouldBe dist.reduceOption(_ + _)
    local.fold(Fold(0, (x: Int) => x * x, (a: Int, b: Int) => a + b)) shouldBe
      dist.fold(Fold(0, (x: Int) => x * x, (a: Int, b: Int) => a + b))
  }

  it should "support comprehensions, grouping, and bag equality" in {
    val b = for {
      x <- LocalBag(1, 2, 3)
      y <- LocalBag("a", "b")
    } yield (x, y)
    b.size shouldBe 6
    val grouped = LocalBag(1, 2, 3, 4, 5, 6).foldGroup(_ % 2, Sum(Numeric[Int]))
      .collect().map(g => g.key -> g.values).toMap
    grouped shouldBe Map(0 -> 12, 1 -> 9)
    // multiset equality, order-insensitive
    LocalBag(1, 2, 2) shouldBe LocalBag(2, 1, 2)
    LocalBag(1, 2) should not be LocalBag(1, 2, 2)
  }

  "LocalBag file IO" should "round-trip CSV and text without a SparkSession" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_localbag_io")
    val rows = LocalBag.of(Seq(
      (1L, "plain", 1.5), (2L, "with,comma", -2.0), (3L, "with \"quote\"", 0.25)))
    rows.writeCSV(s"$dir/rows.csv")
    LocalBag.readCSV[(Long, String, Double)](s"$dir/rows.csv") shouldBe rows
    // header + alternate delimiter
    rows.writeCSV(s"$dir/rows2.csv", CSV(header = true, delimiter = ';'))
    LocalBag.readCSV[(Long, String, Double)](s"$dir/rows2.csv",
      CSV(header = true, delimiter = ';')) shouldBe rows
    val texts = LocalBag("alpha", "beta gamma", "delta")
    texts.writeText(s"$dir/t.txt")
    LocalBag.readText(s"$dir/t.txt") shouldBe texts
  }

  it should "round-trip Parquet without a SparkSession and interoperate with DataBag" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_localbag_parquet")
    val rows = Seq((1L, "alpha", 10.5, true), (2L, "beta éü", -3.0, false),
      (3L, "gamma", 0.125, true))
    val bag = LocalBag.of(rows)
    // local write -> local read (snappy default and uncompressed)
    bag.writeParquet(s"$dir/local.parquet")
    LocalBag.readParquet[(Long, String, Double, Boolean)](
      s"$dir/local.parquet") shouldBe bag
    bag.writeParquet(s"$dir/plain.parquet", Parquet(codec = "none"))
    LocalBag.readParquet[(Long, String, Double, Boolean)](
      s"$dir/plain.parquet") shouldBe bag
    // local write -> DISTRIBUTED read (column names value/_1.._n align)
    DataBag.readParquet[(Long, String, Double, Boolean)](s"$dir/local.parquet")
      .collect().sorted shouldBe rows.sorted
    // distributed write -> LOCAL read (a part-file directory)
    DataBag(rows).writeParquet(s"$dir/dist_parquet")
    LocalBag.readParquet[(Long, String, Double, Boolean)](s"$dir/dist_parquet")
      .collect().sorted shouldBe rows.sorted
    // local OVERWRITE of the Spark-written DIRECTORY (mode-overwrite twin)
    bag.writeParquet(s"$dir/dist_parquet")
    LocalBag.readParquet[(Long, String, Double, Boolean)](
      s"$dir/dist_parquet") shouldBe bag
    // single-column bags use Spark's `value` column name in both backends
    val singles = Seq(5L, 7L, 11L)
    LocalBag.of(singles).writeParquet(s"$dir/single.parquet")
    DataBag.readParquet[Long](s"$dir/single.parquet").collect()
      .sorted shouldBe singles.sorted
    DataBag(singles).writeParquet(s"$dir/dist_single")
    LocalBag.readParquet[Long](s"$dir/dist_single").collect()
      .sorted shouldBe singles.sorted
  }

  it should "interoperate with DataBag IO on the same files (both directions)" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_localbag_interop")
    val rows = Seq((1L, "alpha", 10.5), (2L, "beta,comma", -3.0), (3L, "ga\"mma", 0.125))
    // local write -> distributed read
    LocalBag.of(rows).writeCSV(s"$dir/local.csv")
    DataBag.readCSV[(Long, String, Double)](s"$dir/local.csv").collect()
      .sorted shouldBe rows.sorted
    // distributed write -> local read (a part-file directory)
    DataBag(rows).writeCSV(s"$dir/dist_csv")
    LocalBag.readCSV[(Long, String, Double)](s"$dir/dist_csv")
      .collect().sorted shouldBe rows.sorted
    // text, both directions
    val texts = Seq("one line", "another line", "third")
    LocalBag.of(texts).writeText(s"$dir/local.txt")
    DataBag.readText(s"$dir/local.txt").collect().sorted shouldBe texts.sorted
    DataBag(texts).writeText(s"$dir/dist_txt")
    LocalBag.readText(s"$dir/dist_txt").collect().sorted shouldBe texts.sorted
  }

  it should "drop the per-part-file headers of a multi-part distributed write" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_localbag_multipart")
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    // Spark's writer emits a header into EVERY part file; the local reader
    // must drop one per file, not one per directory
    DataBag.from(spark.createDataset(rows).repartition(3))
      .writeCSV(s"$dir/multi", CSV(header = true))
    val parts = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/multi"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith("part-"))
      } finally s.close()
    }
    parts should be >= 2 // the scenario under test needs multiple part files
    LocalBag.readCSV[(Long, String)](s"$dir/multi", CSV(header = true))
      .collect().sorted shouldBe rows.sorted
  }

  it should "round-trip an empty-string single-field row (empty line kept)" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_localbag_empty")
    val vals = Seq("alpha", "", "beta")
    LocalBag.of(vals).writeCSV(s"$dir/empty.csv")
    LocalBag.readCSV[String](s"$dir/empty.csv").collect() shouldBe vals
  }

  "DataBag.flatMapBag" should "run a local-bag comprehension inside the closure" in {
    val dist = new DataBag(spark.createDataset(Seq(1, 2, 3)))
    // per-element local comprehension (the reference's DataBagSpec.scala:
    // 186-199 shape): for each x, pair it with every smaller positive int
    val out = dist.flatMapBag { x =>
      for { y <- LocalBag((1 until x): _*) } yield (x, y)
    }
    out.collect().sorted shouldBe Seq((2, 1), (3, 1), (3, 2))
    // and the inner bag can itself be folded inside the closure
    val sums = dist.flatMapBag(x => LocalBag(LocalBag((1 to x): _*).sum))
    sums.collect().sorted shouldBe Seq(1, 3, 6)
  }
}
