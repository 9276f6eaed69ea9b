package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Hard-negative mining and the near-dup-aware split. */
class MiningSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Similarity.hardNegatives"

  // two tight clusters; anchors in cluster 0, positives = same cluster
  private val vecs = (0L until 20L).map { id =>
    val c = (id % 2).toInt
    (id, Seq.tabulate(8)(j => if (j % 2 == c) 10f + (id % 5) * 0.1f else 1f), c)
  }.toDF("vec_id", "embedding", "label")

  it should "exclude positives and self, rank the confusables" in {
    val anchors = vecs.where(col("vec_id") < 2)
    val positives = anchors.select(col("vec_id").as("anchor_id"), col("label").as("al"))
      .join(vecs.select(col("vec_id").as("pos_id"), col("label").as("pl")),
        col("al") === col("pl")).select("anchor_id", "pos_id")
    val got = Similarity.hardNegatives(vecs, anchors, positives, k = 3).collect()
    got.length shouldBe 6 // 2 anchors × 3
    got.foreach { r =>
      val (qid, did) = (r.getLong(0), r.getLong(1))
      did % 2 should not be qid % 2 // every returned row is cross-cluster
      did should not be qid
    }
    // ranks are per-anchor dense 1..3 by descending sim
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.map(_.getInt(3)).sorted shouldBe Array(1, 2, 3)
      val ordered = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      ordered shouldBe ordered.sorted.reverse
    }
  }

  it should "fall back to ALL non-self items when positives is empty" in {
    val anchors = vecs.where(col("vec_id") === 0L)
    val none = Seq.empty[(Long, Long)].toDF("anchor_id", "pos_id")
    Similarity.hardNegatives(vecs, anchors, none, k = 19).count() shouldBe 19
  }

  behavior of "Similarity.hardNegativesIndexed"

  it should "equal the brute path under a full probe with generous overfetch" in {
    // nprobe = nlist probes every cell and k·overfetch ≥ corpus size makes
    // the candidate set exhaustive, so the indexed result must be
    // ROW-IDENTICAL to the brute scan (same exact-rerank cosine, same
    // anti-join, same ranking arithmetic)
    val anchors = vecs.where(col("vec_id") < 2)
    val positives = anchors.select(col("vec_id").as("anchor_id"), col("label").as("al"))
      .join(vecs.select(col("vec_id").as("pos_id"), col("label").as("pl")),
        col("al") === col("pl")).select("anchor_id", "pos_id")
    val idx = PqIndex.build(vecs, nlist = 4, m = 4, ksub = 4, maxIter = 3)
    val indexed = Similarity.hardNegativesIndexed(idx, anchors, positives,
        k = 3, nprobe = 4, rerankWith = Some(vecs), rerankFactor = 8,
        overfetch = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val brute = Similarity.hardNegatives(vecs, anchors, positives, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    indexed shouldBe brute
  }

  behavior of "Curation.dedupAwareSplit"

  private val base = "the quick brown fox jumps over the lazy dog again and " +
    "again while the rain falls softly on the quiet hillside this evening"
  private val docs = ((0L until 12L).map { i =>
    (i, s"unique document number $i about topic ${i * 7} with its own " +
      s"words like token${i}a token${i}b token${i}c token${i}d token${i}e")
  } ++ Seq(
    (100L, base), (101L, base + " extra"), (102L, base + " more extra")
  )).toDF("doc_id", "text")

  it should "keep every near-dup cluster inside one split" in {
    val got = Curation.dedupAwareSplit(docs, "text",
        splits = Seq("train" -> 0.5, "test" -> 0.5), minJaccard = 0.2)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    got.size shouldBe 15 // totality: every doc labeled
    got(100L) shouldBe got(101L)
    got(101L) shouldBe got(102L)
    // the cluster's split is the canonical member's row-keyed draw
    val solo = Sampling.hashSplit(docs.where(col("doc_id") === 100L),
      col("doc_id"), Seq("train" -> 0.5, "test" -> 0.5))
      .select("split").head().getString(0)
    got(100L) shouldBe solo
  }

  it should "be deterministic" in {
    def run() = Curation.dedupAwareSplit(docs, "text",
        Seq("train" -> 0.5, "test" -> 0.5), minJaccard = 0.2)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    run().toSeq shouldBe run().toSeq
  }
}
