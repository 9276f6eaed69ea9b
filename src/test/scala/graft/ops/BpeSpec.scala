package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** BPE trainer vs a textbook sequential Scala implementation: the merge
  * sequence (with lexicographic tie-break) must agree exactly. */
class BpeSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Sequential reference: word histogram → repeated (argmax, merge). */
  private def seqBpe(corpus: Seq[String], numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = corpus
      .flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.split("").toList, c) }
    def mergeWord(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; Seq(a, b) <- syms.sliding(2))
        pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
      val best = pairs.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((l, r, c))
          words = words.groupMapReduce(kv => mergeWord(kv._1, l, r))(_._2)(_ + _)
        case _ => done = true
      }
    }
    out.toSeq
  }

  it should "reproduce the sequential merge sequence exactly (incl. tie-breaks)" in {
    val corpus = Seq(
      "low low low low low", "lower lower newest newest",
      "newest newest newest newest", "widest widest widest",
      "aaa aa aaa aa a")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, numMerges = 12)
    val got = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    got shouldBe seqBpe(corpus, 12)
  }

  it should "stop early when no pair repeats, and encode() applies merges greedily" in {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val (merges, words) = Bpe.train(docs, numMerges = 10)
    merges.count() shouldBe 0 // every pair occurs once
    // greedy left-to-right: merging (a,a) in "aaa" gives [aa, a], not [a, aa]
    val enc = Bpe.encode(Seq((1L, "aaa")).toDF("doc_id", "text"),
      Seq(("a", "a"))).collect()
    enc.head.getSeq[String](2) shouldBe Seq("aa", "a")
    words.count() shouldBe 2
  }

  it should "agree with the sequential twin on seeded random corpora (tie-heavy alphabets)" in {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      // 2-letter alphabet, short words: maximal pair-count ties, repeated
      // merges whose outputs ("aa", "ab") collide with later pair symbols
      val corpus = Seq.fill(6)(
        Seq.fill(rnd.nextInt(8) + 3)(
          Seq.fill(rnd.nextInt(4) + 1)("ab" (rnd.nextInt(2))).mkString)
          .mkString(" "))
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (merges, _) = Bpe.train(docs, numMerges = 6)
      val got = merges.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      withClue(s"seed=$seed corpus=$corpus: ") {
        got shouldBe seqBpe(corpus, 6)
      }
    }
  }

  it should "shrink token counts by at least 2 per merge" in {
    val docs = Seq((1L, "banana banana bandana banana band and sand strand"))
      .toDF("doc_id", "text")
    val before = docs.selectExpr("sum(length(replace(text, ' ', ''))) s")
      .head().getLong(0)
    val (merges, words) = Bpe.train(docs, numMerges = 8)
    val n = merges.count()
    val after = words.selectExpr("sum(size(syms) * cnt) s").head().getLong(0)
    after should be <= before - 2 * n
  }
}
