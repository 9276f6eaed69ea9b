package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Distributed PCA: exact integer moments, deterministic Jacobi, projection
  * variance = eigenvalue. */
class PcaSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "jacobiEigen" should "solve a known symmetric matrix" in {
    val (ev, w) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    ev(0) shouldBe 3.0 +- 1e-12
    ev(1) shouldBe 1.0 +- 1e-12
    val r = 1.0 / math.sqrt(2.0)
    w(0)(0) shouldBe r +- 1e-9
    w(0)(1) shouldBe r +- 1e-9
    w(1)(0) shouldBe r +- 1e-9
    w(1)(1) shouldBe -r +- 1e-9
  }

  it should "return an orthonormal basis with descending eigenvalues" in {
    val rnd = new scala.util.Random(7)
    val d = 12
    val b = Array.fill(d, d)(rnd.nextGaussian())
    // symmetric PSD: BᵀB
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val (ev, w) = Pca.jacobiEigen(a)
    ev.sliding(2).foreach(p => p(0) should be >= p(1) - 1e-9)
    for (i <- 0 until d; j <- 0 until d) {
      val dotp = (0 until d).map(k => w(i)(k) * w(j)(k)).sum
      dotp shouldBe (if (i == j) 1.0 else 0.0) +- 1e-8
    }
    // A·wᵢ = λᵢ·wᵢ
    for (i <- 0 until d; r <- 0 until d) {
      val aw = (0 until d).map(k => a(r)(k) * w(i)(k)).sum
      aw shouldBe ev(i) * w(i)(r) +- 1e-6 * math.max(math.abs(ev(0)), 1.0)
    }
  }

  private def syntheticEmb(n: Int, parts: Int) = {
    val rnd = new scala.util.Random(42)
    val dir = Array(0.6f, 0.8f, 0.0f, 0.0f)
    val rows = (0 until n).map { i =>
      val t = rnd.nextGaussian().toFloat * 0.4f
      val noise = Array.fill(4)(rnd.nextGaussian().toFloat * 0.02f)
      (i.toLong, Array.tabulate(4)(j => dir(j) * t + noise(j)))
    }
    spark.createDataset(rows).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
      .repartition(parts)
  }

  "moments" should "be exactly partitioning-independent" in {
    val m1 = Pca.moments(syntheticEmb(300, 1))
    val m7 = Pca.moments(syntheticEmb(300, 7))
    m1.n shouldBe m7.n
    m1.sum.toSeq shouldBe m7.sum.toSeq
    m1.prod.toSeq shouldBe m7.prod.toSeq
  }

  "fit + project" should "recover the dominant direction and match variances" in {
    val emb = syntheticEmb(500, 5)
    val model = Pca.fit(emb)
    // dominant component ≈ ±(0.6, 0.8, 0, 0)
    math.abs(model.components(0)(0) * 0.6 + model.components(0)(1) * 0.8) shouldBe 1.0 +- 0.01
    val proj = Pca.project(emb, model, k = 2)
    proj.count() shouldBe 500
    val stats = proj.selectExpr("posexplode(projection) as (c, y)")
      .groupBy("c")
      .agg(org.apache.spark.sql.functions.expr("count(*) as n"),
        org.apache.spark.sql.functions.expr("sum(y) as s"),
        org.apache.spark.sql.functions.expr("sum(y*y) as ss"))
      .collect().map(r => (r.getInt(0),
        (r.getDouble(2) / r.getLong(1),
          r.getDouble(3) / r.getLong(1) - math.pow(r.getDouble(2) / r.getLong(1), 2))))
      .toMap
    for (c <- 0 until 2) {
      val (mean, variance) = stats(c)
      math.abs(mean) should be <= 1e-6 * math.sqrt(model.eigenvalues(0))
      variance shouldBe model.eigenvalues(c) +- 1e-7 * model.eigenvalues(0)
    }
    // whitened projections have unit variance
    val white = Pca.project(emb, model, k = 2, whiten = true)
      .selectExpr("posexplode(projection) as (c, y)")
      .groupBy("c").agg(org.apache.spark.sql.functions.expr("sum(y*y)/count(*) as v"))
      .collect().map(_.getDouble(1))
    white.foreach(_ shouldBe 1.0 +- 1e-6)
  }
}
