package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Product quantization: code shape/determinism, the est_norm lookup
  * against a driver-side recompute, and ADC(+rerank) recall against exact
  * brute force on deterministic clustered vectors. */
class PqSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // 120 deterministic vectors in 4 well-separated 16-dim clusters with a
  // small per-id wobble — near-dup structure like a real embedding table
  private lazy val vecs = {
    val rows = (0L until 120L).map { id =>
      val c = (id % 4).toInt
      val base = Array.tabulate(16)(j => if (j % 4 == c) 10.0f else 1.0f)
      val wobble = Array.tabulate(16)(j => ((id * 31 + j * 7) % 13).toFloat / 13f)
      (id, base.zip(wobble).map { case (b, w) => b + w }.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val cb = Pq.train(vecs, m = 4, ksub = 8, maxIter = 6)

  behavior of "Pq.encode"

  it should "emit m codes in [0, ksub) with the codebook's est_norm" in {
    val codes = Pq.encode(cb, vecs).collect()
    codes.length shouldBe 120
    codes.foreach { r =>
      val code = r.getSeq[Int](1)
      code.length shouldBe 4
      code.foreach(c => assert(c >= 0 && c < 8))
      // est_norm == sqrt(sum of chosen centroids' squared norms)
      val expect = math.sqrt(code.zipWithIndex.map { case (c, s) =>
        cb.books(s).find(_._1 == c).get._2.map(x => x * x).sum
      }.sum)
      r.getDouble(2) shouldBe expect +- 1e-9
    }
  }

  it should "be deterministic across runs" in {
    val a = Pq.encode(cb, vecs).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val b = Pq.encode(cb, vecs).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    a shouldBe b
  }

  behavior of "Pq.adcTopK"

  private def recallVsExact(got: Array[(Long, Long)], k: Int): Double = {
    val qs = vecs.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(vecs, qs, k).select("qid", "did")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.count(exact.contains).toDouble / exact.size
  }

  it should "reach high recall with exact rerank" in {
    val qs = vecs.where(col("vec_id") < 10)
    val codes = Pq.encode(cb, vecs)
    val got = Pq.adcTopK(cb, codes, qs, k = 5,
        rerankWith = Some(vecs), rerankFactor = 4)
      .select("qid", "did").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe 50 // full k per query
    recallVsExact(got, 5) should be >= 0.9
  }

  it should "return full k per query without rerank and decent recall" in {
    val qs = vecs.where(col("vec_id") < 10)
    val codes = Pq.encode(cb, vecs)
    val got = Pq.adcTopK(cb, codes, qs, k = 5)
      .select("qid", "did").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe 50
    recallVsExact(got, 5) should be >= 0.6
  }

  it should "rank reranked results by exact cosine" in {
    val qs = vecs.where(col("vec_id") === 0L)
    val codes = Pq.encode(cb, vecs)
    val got = Pq.adcTopK(cb, codes, qs, k = 3,
        rerankWith = Some(vecs), rerankFactor = 8)
      .orderBy("rank").collect()
    val sims = got.map(_.getDouble(2))
    sims shouldBe sims.sorted.reverse
  }
}
