package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.CosineSim
import graft.ops.Similarity

/** The injectOptimizerRule tier: composed cosine → native CosineSim. */
class FuseCosineSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = {
    FuseCosine.register(spark)
    val rnd = new scala.util.Random(11)
    (0 until 20).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").persist()
  }

  private def hasNative(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[CosineSim]))

  "FuseCosineRule" should "rewrite the composed form to the native expression" in {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        Similarity.cosineComposed(col("a.v"), col("b.v")).as("sim"))
    hasNative(pairs) shouldBe true
    // exactness: the fused result equals the driver-side same-order loop
    val vals = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    pairs.collect().foreach { r =>
      val (x, y) = (vals(r.getLong(0)), vals(r.getLong(1)))
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      (x, y).zipped.foreach { (a, b) =>
        dot += a.toDouble * b.toDouble; nx += a.toDouble * a.toDouble; ny += b.toDouble * b.toDouble
      }
      r.getDouble(2) shouldBe dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  it should "leave non-cosine shapes alone" in {
    // norms over a THIRD column — not a cosine of (a, b); must not fuse
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select((Similarity.dot(col("a.v"), col("b.v")) /
        (sqrt(Similarity.dot(col("a.v"), col("a.v"))) *
          sqrt(Similarity.dot(col("b.v"), col("b.v"))))).as("sim_fused"),
        (Similarity.dot(col("a.v"), col("b.v")) /
          (sqrt(Similarity.dot(col("a.v"), col("a.v"))) *
            sqrt(Similarity.dot(col("a.v"), col("a.v"))))).as("not_cosine"))
    // the first column IS the cosine shape (fuses); the second mixes arrays
    val exprs = df.queryExecution.optimizedPlan.expressions
    exprs.count(_.exists(_.isInstanceOf[CosineSim])) shouldBe 1
  }

  it should "not fuse double arrays (CosineSim reads 4-byte floats)" in {
    val d = vecs.select(col("id"), transform(col("v"), _.cast("double")).as("v"))
    val df = d.as("a").crossJoin(d.as("b"))
      .select(Similarity.cosineComposed(col("a.v"), col("b.v")).as("sim"))
    hasNative(df) shouldBe false
    df.head() // still evaluates fine un-fused
  }
}
