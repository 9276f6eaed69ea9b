package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Count-min sketch contract under both collision-free and adversarially
  * tiny widths, plus token-entropy parity with a Seq-computed oracle. */
class SketchesSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Sketches.countMinSketch"

  private def truthAndEst(width: Int) = {
    val keys = (1 to 40).flatMap(k => Seq.fill(k % 7 + 1)(s"k$k"))
      .toDF("k0").select(col("k0"))
    val sk = Sketches.countMinSketch(keys, col("k0"), depth = 3, width = width)
    val truth = keys.groupBy("k0").agg(count(lit(1)).as("tc"))
    val est = Sketches.cmsEstimate(sk, truth.select("k0"), col("k0"),
      depth = 3, width = width)
    (sk, truth.join(est, col("k0") === col("k"))
      .select("k0", "tc", "est").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  it should "estimate exactly when the width dwarfs the key count" in {
    val (_, rows) = truthAndEst(width = 4096)
    rows should have size 40
    every(rows.map(r => r._3 == r._2).toList) shouldBe true
  }

  it should "never undercount even at an adversarially tiny width" in {
    val (sk, rows) = truthAndEst(width = 4) // heavy collisions guaranteed
    every(rows.map(r => r._3 >= r._2).toList) shouldBe true
    // mass conservation: each depth row carries the full item count
    val total = rows.map(_._2).sum
    val perDepth = sk.groupBy("d").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1)).toSet
    perDepth shouldBe Set(total)
  }

  behavior of "TextAnalysis.tokenEntropy"

  it should "match a Seq-computed entropy and be zero for repeated tokens" in {
    val docs = Seq(
      (1L, "a b c d"),        // uniform: entropy = ln 4
      (2L, "x x x x x"),      // single token: entropy = 0
      (3L, "a a b"),          // 2/3,1/3 distribution
      (4L, "  spaced   out  tokens ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs)
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def seqEntropy(s: String): Double = {
      val cs = s.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).values.map(_.length.toDouble)
      val n = cs.sum
      val sMicros = cs.map(c => math.floor(c * math.log(c) * 1e6 + 0.5).toLong).sum
      math.floor((math.log(n) - (sMicros / 1e6) / n) * 1e6 + 0.5) / 1e6
    }
    got(1L) shouldBe seqEntropy("a b c d")
    got(1L) shouldBe (math.log(4.0) +- 1e-5)
    got(2L) shouldBe 0.0
    got(3L) shouldBe seqEntropy("a a b")
    got(4L) shouldBe seqEntropy("spaced out tokens")
  }

  behavior of "TextAnalysis.dedupParagraphs"

  it should "keep first occurrences, rebuild in order, and keep emptied docs" in {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa\n\nbbb\n\nccc"),
      (2L, "bbb\n\nddd"),      // bbb first seen in doc 1 -> only ddd survives
      (3L, "aaa"),             // everything dup -> empty, but the doc stays
      (4L, "eee\n\n\n\nfff")   // blank paragraph dropped, not deduped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphs(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(
      1L -> "aaa\n\nbbb\n\nccc",
      2L -> "ddd",
      3L -> "",
      4L -> "eee\n\nfff")
  }

  it should "be invariant to partitioning (first = smallest (doc, pos))" in {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, s"p${i % 7}\n\nq${i % 13}\n\nu$i")).toDF("doc_id", "text")
    val a = TextAnalysis.dedupParagraphs(docs.repartition(1))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = TextAnalysis.dedupParagraphs(docs.repartition(17))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    a shouldBe b
    // every p/q paragraph survives exactly once, in its smallest doc
    a.head shouldBe ((0L, "p0\n\nq0\n\nu0"))
    a(7) shouldBe ((7L, "q7\n\nu7")) // p0 already taken by doc 0
  }

  behavior of "TextAnalysis.stripBoilerplate"

  it should "remove over-common paragraphs everywhere, first copy included" in {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav\n\nunique1"),
      (2L, "nav\n\nunique2"),
      (3L, "nav\n\nunique3"),
      (4L, "nav"),            // only boilerplate -> empty
      (5L, "twice\n\nu5"),
      (6L, "twice\n\nu6")     // 'twice' in 2 docs <= maxDocs -> kept BOTH places
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripBoilerplate(docs, maxDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(
      1L -> "unique1", 2L -> "unique2", 3L -> "unique3", 4L -> "",
      5L -> "twice\n\nu5", 6L -> "twice\n\nu6")
  }

  behavior of "TextAnalysis.compressionRatio"

  it should "match a direct JDK Deflater computation exactly" in {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps going"),
      (2L, "ab " * 60),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (4L, "Füßgänger überqueren die Straße 千字文 morning")
    ).toDF("doc_id", "text")
    def ref(t: String): (Long, Long) = {
      val bytes = t.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      (bytes.length.toLong, n * 1000L / bytes.length)
    }
    val got = TextAnalysis.compressionRatio(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.collect().foreach { r =>
      got(r.getLong(0)) shouldBe ref(r.getString(1))
    }
    // the signal discriminates: pure repetition far below mixed prose
    got(3L)._2 should be < got(1L)._2
  }

  it should "stay inside whole-stage codegen (no object round trip)" in {
    // non-literal source so ConvertToLocalRelation can't pre-evaluate the
    // projection (a folded plan would hide the expression being asserted)
    val docs = spark.range(0, 10)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    val plan = TextAnalysis.compressionRatio(docs)
      .queryExecution.executedPlan.toString
    plan should include("deflate_size")
    // the "*(n)" prefix marks operators fused into whole-stage codegen
    plan should include("*(1) Project")
    plan should not include "SerializeFromObject"
    plan should not include "Scan ExistingRDD"
  }

  it should "be invariant to partitioning and repeated runs" in {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc $i " * (i % 9 + 1).toInt)).toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatio(docs.repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    val b = TextAnalysis.compressionRatio(docs.repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    a shouldBe b
  }
}
