package graft.lib

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.DataBag

/** Differential tests: typed DataBag pipelines vs columnar formulations, and
  * kMeans on separable blobs. */
class PipelinesSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "wordCount" should "agree between the typed DataBag path and the columnar path" in {
    val lines = Seq("a b b", "c a", " ", "b")
    val typed = TextPipelines.wordCountTyped(DataBag(lines))
      .collect().toMap
    val columnar = TextPipelines.wordCount(
      lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    typed shouldBe Map("a" -> 2L, "b" -> 3L, "c" -> 1L)
    columnar shouldBe typed
  }

  "KMeans.fit" should "separate two obvious blobs" in {
    val pts = (Seq.tabulate(10)(i => (i.toLong, Array(10f + i * 0.01f, 10f))) ++
      Seq.tabulate(10)(i => (100L + i, Array(-10f - i * 0.01f, -10f))))
      .toDF("vec_id", "embedding")
    val fit = KMeans.fit(pts, k = 2, maxIter = 10)
    val byCluster = fit.collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byCluster.values.toSet shouldBe Set(
      (0L until 10L).toSet, (100L until 110L).toSet)
  }
}
