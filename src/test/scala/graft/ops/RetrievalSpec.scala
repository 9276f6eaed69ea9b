package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** BM25 retrieval against an independent sequential twin. */
class RetrievalSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark query engine for big data"),
    (2L, "query optimizer rewrites the query plan"),
    (3L, "big data shuffles and big partitions"),
    (4L, "an unrelated document about cats"),
    (5L, "query engine query engine query engine")
  )

  /** Sequential BM25 twin: same idf variant, same micro-rounding. */
  private def twin(queries: Seq[(String, String)], k1: Double = 1.2, b: Double = 0.75)
      : Map[(String, Long), Long] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty) }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val tf = toks.flatMap { case (id, ts) => ts.groupBy(identity).map { case (w, g) => (id, w, g.size) } }
    val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size }
    val out = scala.collection.mutable.Map[(String, Long), Long]().withDefaultValue(0L)
    for ((qid, qtext) <- queries; term <- qtext.trim.split("\\s+").filter(_.nonEmpty).distinct) {
      for ((id, w, f) <- tf if w == term) {
        val dl = toks.find(_._1 == id).get._2.size
        val idf = math.log(1.0 + (n.toDouble - df(w) + 0.5) / (df(w) + 0.5))
        val tfn = (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl.toDouble / avgdl))
        out((qid, id)) += math.floor(idf * tfn * 1000000.0 + 0.5).toLong
      }
    }
    out.toMap
  }

  "Retrieval.bm25Scores" should "match the sequential twin exactly, incl. multi-term queries" in {
    val queries = Seq(("q_a", "query engine"), ("q_b", "big"), ("q_c", "query query plan"))
    val got = Retrieval.bm25Scores(corpus.toDF("doc_id", "text"), queries.toDF("query_id", "qtext"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe twin(queries)
  }

  it should "rank rarer terms above ubiquitous ones" in {
    // "cats" appears once; "query" in 3 docs — doc 4 must top the cats query
    val qs = Seq(("q", "cats")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), qs, k = 1).collect()
    top.length shouldBe 1
    top.head.getLong(1) shouldBe 4L
  }

  "Retrieval.rankingMetrics" should "compute capped recall, MRR, and nDCG" in {
    // q: results ranked 1..4 = docs 10,20,30,40; truth = {20, 40, 99}
    // hits at ranks 2 and 4: recall@3... k=4: nhits=2, nrel=3 -> 2/3;
    // mrr = 1/2; dcg = 1/log2(3) + 1/log2(5); idcg = 1/log2(2) + 1/log2(3)
    // + 1/log2(4) (min(nrel,k)=3 ideal hits)
    val results = Seq(("q", 10L, 1L), ("q", 20L, 2L), ("q", 30L, 3L), ("q", 40L, 4L))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q", 20L), ("q", 40L), ("q", 99L)).toDF("query_id", "doc_id")
    val r = Retrieval.rankingMetrics(results, truth, k = 4).collect().head
    r.getLong(1) shouldBe math.floor(2.0 / 3.0 * 1e6 + 0.5).toLong
    r.getLong(2) shouldBe 500000L
    val dcg = 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(5) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    r.getLong(3) shouldBe math.floor(dcg / idcg * 1e6 + 0.5).toLong
    // no hits at all: every metric zero
    val none = Retrieval.rankingMetrics(results,
      Seq(("q", 77L)).toDF("query_id", "doc_id"), k = 4).collect().head
    (none.getLong(1), none.getLong(2), none.getLong(3)) shouldBe ((0L, 0L, 0L))
  }

  "Retrieval.rrfFuse" should "sum reciprocal-rank contributions and keep top-k" in {
    // q: list A ranks docs 1,2,3; list B ranks 3,2,1 — the end docs tie
    // (floor(1e6/61)+floor(1e6/63) = 16393+15873 = 32266) above the
    // middle doc (2*floor(1e6/62) = 32258); ties break by doc_id asc
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 3L, 1L), ("q", 2L, 2L), ("q", 1L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy { case (d, s) => (-s, d) }
    got shouldBe Array((1L, 32266L), (3L, 32266L), (2L, 32258L))
    // a doc missing from one list still scores from the other
    val single = Retrieval.rrfFuse(
      Seq(Seq(("q", 9L, 1L)).toDF("query_id", "doc_id", "rank")), k = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    single shouldBe Array((9L, 16393L))
  }

  "Retrieval.bm25TopK" should "keep exactly k docs per query in total order" in {
    val qs = Seq(("q1", "query"), ("q2", "big data")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), qs, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (_, rows) => rows.length shouldBe 2 }
    val all = twin(Seq(("q1", "query"), ("q2", "big data")))
    for ((qid, rows) <- got.groupBy(_._1)) {
      val expect = all.collect { case ((q, d), s) if q == qid => (d, s) }.toSeq
        .sortBy { case (d, s) => (-s, d) }.take(2).map { case (d, s) => (qid, d, s) }
      rows.sortBy(r => (-r._3, r._2)).toSeq shouldBe expect
    }
  }
}
