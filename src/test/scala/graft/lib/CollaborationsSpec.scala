package graft.lib

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Hand-computed fixtures for the reference's IMDb example pipelines
  * (DirectorsMuses, GraphPreprocessing). */
class CollaborationsSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // director 1: actor 10 in movies 100,101,102 (3x), actor 11 in 100,101 (2x),
  //             actor 12 in 100 (1x)
  // director 2: actor 10 in 200 (1x) — max is 1, nothing passes cnt > 1
  private val credits = Seq(
    (1L, 100L, "director"), (1L, 101L, "director"), (1L, 102L, "director"),
    (2L, 200L, "director"),
    (10L, 100L, "actor"), (10L, 101L, "actor"), (10L, 102L, "actor"),
    (11L, 100L, "actor"), (11L, 101L, "actor"),
    (12L, 100L, "actor"),
    (10L, 200L, "actor")
  ).toDF("personID", "movieID", "creditType")

  "directorsMuses" should "keep actors within 1 of the director's max, above 1" in {
    val got = Collaborations.directorsMuses(credits)
      .as[(Long, Long, Long)].collect().toSet
    // director 1: max=3 → actor 10 (3 ≥ 2) and actor 11 (2 ≥ 2) pass;
    // actor 12 fails cnt > 1. director 2: its only pair has cnt 1 → excluded.
    got shouldBe Set((1L, 10L, 3L), (1L, 11L, 2L))
  }

  it should "count duplicate credits like the reference's bag semantics" in {
    val dup = credits.union(Seq((10L, 100L, "actor")).toDF("personID", "movieID", "creditType"))
    val counts = Collaborations.collaborations(dup)
      .groupBy("director", "actor").count()
      .where($"director" === 1L && $"actor" === 10L)
      .as[(Long, Long, Long)].collect()
    counts.head._3 shouldBe 4L // 3 distinct movies + 1 duplicated credit row
  }

  "collaborationEdges" should "carry an arbitrary fold as the edge label" in {
    val got = Collaborations.collaborationEdges(credits, max(col("movieID")))
      .as[(Long, Long, Long)].collect().toSet
    got shouldBe Set(
      (1L, 10L, 102L), (1L, 11L, 101L), (1L, 12L, 100L), (2L, 10L, 200L))
  }
}
