package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Randomized differential for the round-8 relational ops: random inputs
  * run through the Spark operator AND a straight-line Scala reference,
  * then compared exactly. Seeded — failures reproduce. */
class OpsDifferentialSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "Curation.corpusDiff" should "agree with a sequential reference on random snapshots" in {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      def snap(): Map[Long, String] =
        (1L to 60L).flatMap { id =>
          if (rnd.nextDouble() < 0.7) Some(id -> s"t${rnd.nextInt(5)}") else None
        }.toMap
      val (v1, v2) = (snap(), snap())
      val expected = ((v1.keySet ++ v2.keySet).flatMap { id =>
        (v1.get(id), v2.get(id)) match {
          case (None, Some(_)) => Some(id -> "added")
          case (Some(_), None) => Some(id -> "removed")
          case (Some(a), Some(b)) if a != b => Some(id -> "changed")
          case _ => None
        }
      }).toMap
      val got = Curation.corpusDiff(
          v1.toSeq.toDF("doc_id", "text"), v2.toSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      withClue(s"[seed=$seed] ") { got shouldBe expected }
    }
  }

  "Retrieval.rankingMetrics" should "agree with a sequential reference on random rankings" in {
    def log2(x: Double) = math.log(x) / math.log(2)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val k = rnd.nextInt(8) + 3
      val queries = (1 to 4).map(q => s"q$q")
      val results = queries.flatMap { q =>
        val docs = rnd.shuffle((1L to 30L).toList).take(15)
        docs.zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
      }
      val truth = queries.flatMap { q =>
        (1L to 30L).filter(_ => rnd.nextDouble() < 0.3).map(d => (q, d))
      }
      val expected = queries.flatMap { q =>
        val rel = truth.collect { case (`q`, d) => d }.toSet
        if (rel.isEmpty) None
        else {
          val ranked = results.collect { case (`q`, d, r) if r <= k => (d, r) }
          val hits = ranked.filter(p => rel.contains(p._1))
          val recall = hits.size.toDouble / math.min(rel.size, k)
          val mrr = hits.map(_._2).minOption.map(1.0 / _).getOrElse(0.0)
          val dcg = hits.map(p => 1.0 / log2(p._2 + 1.0)).sum
          val idcg = (1 to math.min(rel.size, k)).map(i => 1.0 / log2(i + 1.0)).sum
          def mic(x: Double) = math.floor(x * 1e6 + 0.5).toLong
          Some(q -> ((mic(recall), mic(mrr), mic(if (dcg == 0.0) 0.0 else dcg / idcg))))
        }
      }.toMap
      val got = Retrieval.rankingMetrics(
          results.toDF("query_id", "doc_id", "rank"),
          truth.toDF("query_id", "doc_id"), k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      withClue(s"[seed=$seed k=$k] ") { got shouldBe expected }
    }
  }
}
