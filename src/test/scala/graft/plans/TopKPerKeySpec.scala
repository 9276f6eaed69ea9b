package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class TopKPerKeySpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private lazy val data = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map(i => (rnd.nextInt(20).toLong, i.toLong, rnd.nextDouble() * 1000))
      .toDF("k", "id", "v").repartition(7).persist()
  }

  "TopK.perKey" should "equal the window row_number formulation" in {
    val native = TopK.perKey(data, Seq("k"), Seq(col("v").desc, col("id").asc), k = 3)
      .select("k", "id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val windowed = data.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("k", "id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    native shouldBe windowed
  }

  it should "handle ties, k larger than group size, and ascending order" in {
    val small = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 1.0), (2L, 4L, 9.0))
      .toDF("k", "id", "v")
    val asc = TopK.perKey(small, Seq("k"), Seq(col("v").asc, col("id").asc), k = 10)
      .select("id").as[Long].collect().sorted
    asc shouldBe Array(1L, 2L, 3L, 4L)
    val top1 = TopK.perKey(small, Seq("k"), Seq(col("v").asc, col("id").asc), k = 1)
      .select("id").as[Long].collect().sorted
    top1 shouldBe Array(3L, 4L) // ties broken by id: (1.0,id3) and (9.0,id4)
  }

  it should "stay correct when high key cardinality overflows the partial cap" in {
    // ~keys ≈ rows: with a cap of 16, almost every row takes the partial
    // pass-through path, so the final stage must do all the reduction
    val wide = (1 to 4000).map(i => (i.toLong % 1900, i.toLong, (i * 37 % 101).toDouble))
      .toDF("k", "id", "v").repartition(5)
    val capped = TopK.perKey(wide, Seq("k"), Seq(col("v").desc, col("id").asc), k = 2,
        maxPartialKeys = 16)
      .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val windowed = wide.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    capped shouldBe windowed
  }

  it should "plan as partial + shuffle + final with no sort" in {
    val plan = TopK.perKey(data, Seq("k"), Seq(col("v").desc), k = 3)
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    plan should include("Exchange hashpartitioning(k")
    (plan should not).include("Sort ")
    // two TopKPerKeyExec stages: partial below the exchange, final above
    "TopKPerKey".r.findAllIn(plan).size should be >= 2
  }
}
