package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class SkewSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "saltedJoin" should "produce exactly the rows of the plain join under heavy skew" in {
    // 90% of big rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).select("k", "v", "name")
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  "topKeys" should "rank the hottest keys" in {
    val df = (Seq.fill(50)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L)).toDF("k")
    val top = Skew.topKeys(df, "k", 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    top shouldBe Array((1L, 50L), (2L, 10L))
  }
}
