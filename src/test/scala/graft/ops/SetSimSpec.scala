package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Prefix-filtered set-similarity join: exact equivalence to brute force,
  * and genuine candidate pruning. */
class SetSimSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Brute-force all-pairs twin: join the full shingle relation with itself
    * (no prefix, no length filter) and apply the same integer cut. */
  private def bruteForce(docs: DataFrame, tNum: Long, tDen: Long): Set[(Long, Long)] = {
    val sh = Dedup.hashedShingles(docs)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.as("s1").join(sh.as("s2"),
        col("s1.shingle") === col("s2.shingle") && col("s2.doc_id") > col("s1.doc_id"))
      .groupBy(col("s1.doc_id").as("id1"), col("s2.doc_id").as("id2"))
      .agg(count(lit(1)).as("o"))
      .join(cnt.as("c1"), col("id1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("id2") === col("c2.doc_id"))
      .where(col("o") * lit(tDen) >= lit(tNum) * (col("c1.n") + col("c2.n") - col("o")))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def randomCorpus(seed: Int, nDocs: Int, vocab: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until nDocs).map { i =>
      val len = 8 + rnd.nextInt(30)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    // plant exact dups and near dups so high thresholds stay non-trivial
    val planted = base.take(4).map { case (id, t) =>
      (id + nDocs, if (id % 2 == 0) t else t + " extra tail words") }
    (base ++ planted).toDF("doc_id", "text")
  }

  "SetSim.jaccardSelfJoin" should "equal brute force on random corpora at several thresholds" in {
    for (seed <- Seq(1, 2, 3); (tn, td) <- Seq((1L, 2L), (3L, 10L), (9L, 10L))) {
      val docs = randomCorpus(seed, 40, vocab = 60)
      val got = SetSim.jaccardSelfJoin(docs, tNum = tn, tDen = td)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(docs, tn, td)
      withClue(s"seed=$seed t=$tn/$td: ") { got shouldBe want }
    }
  }

  it should "report exact overlap, sizes, and micro-rounded jaccard" in {
    val docs = Seq(
      (1L, "a b c d e"),           // shingles: "a b c","b c d","c d e"
      (2L, "a b c d x"),           // shares "a b c","b c d" -> o=2, n1=3, n2=3, j=2/4=0.5
      (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val rows = SetSim.jaccardSelfJoin(docs, tNum = 1L, tDen = 2L).collect()
    rows.length shouldBe 1
    val r = rows.head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)) shouldBe
      ((1L, 2L, 2L, 3L, 3L, 0.5))
  }

  it should "prune candidates well below the all-pairs count on a diverse corpus" in {
    val docs = randomCorpus(7, 60, vocab = 400) // diverse: most pairs share nothing
    val sh = Dedup.hashedShingles(docs)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val nDocs = docs.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = SetSim.candidatePairs(sh, cnt, 1L, 2L).count()
    withClue(s"candidates=$cands allPairs=$allPairs: ") {
      cands should be < allPairs / 4
    }
    // and completeness is not lost by the pruning
    val got = SetSim.jaccardSelfJoin(docs).select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe bruteForce(docs, 1L, 2L)
  }
}
