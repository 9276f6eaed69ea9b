package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.ops.Similarity

class NativeSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 64).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").persist()
  }

  "CosineSim" should "be bit-identical to the composed Column formulation" in {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
    val diff = pairs.select(
      Native.cosineSim(col("a.v"), col("b.v")).as("native"),
      Similarity.cosineComposed(col("a.v"), col("b.v")).as("composed"))
      .where(col("native") =!= col("composed"))
    diff.count() shouldBe 0L
  }

  it should "run inside whole-stage codegen" in {
    val plan = vecs.select(Native.cosineSim(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage; an interpreted
    // fallback would render a bare Project
    plan should include("*(1) Project")
  }

  it should "null out on null input" in {
    val df = Seq((Array(1f, 2f), null.asInstanceOf[Array[Float]])).toDF("a", "b")
    df.select(Native.cosineSim(col("a"), col("b"))).head().isNullAt(0) shouldBe true
  }

  it should "reject non-float arrays at analysis time" in {
    val dd = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      dd.select(Native.cosineSim(col("a"), col("b"))).collect()
  }

  "register / GraftExtensions" should "expose cosine_sim to SQL" in {
    Native.register(spark)
    vecs.createOrReplaceTempView("native_vecs")
    val r = spark.sql(
      "SELECT cosine_sim(v, v) AS c FROM native_vecs LIMIT 3")
      .collect().map(_.getDouble(0))
    all(r) shouldBe 1.0 +- 1e-9
  }

  private lazy val sigDocs = {
    val rnd = new scala.util.Random(13)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    (0L until 40L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
  }

  "MinHashSig" should "be bit-identical to the explode+groupBy formulation" in {
    for (k <- Seq(1, 4, 8, 9)) {
      val fused = graft.ops.Dedup.minhashSignatures(sigDocs, numHashes = k)
        .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
      val agg = graft.ops.Dedup.minhashSignaturesViaAgg(sigDocs, numHashes = k)
        .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
      withClue(s"numHashes=$k: ") { fused shouldBe agg }
    }
  }

  it should "run inside whole-stage codegen and null out empty arrays" in {
    // range() keeps the input non-foldable so the projection can't be
    // constant-folded away at plan time
    val df = spark.range(4).select(col("id"),
      when(col("id") === 2, array().cast("array<string>"))
        .otherwise(split(concat_ws(" ", col("id").cast("string"), lit("a b")), " "))
        .as("sh"))
    val got = df.select(col("id"), Native.minhashSig(col("sh"), 2).as("s"))
    got.queryExecution.executedPlan.toString should include("*(1) Project")
    val rows = got.collect().sortBy(_.getLong(0))
    rows(0).getSeq[String](1).length shouldBe 2
    rows(0).getSeq[String](1).foreach(_ should fullyMatch regex "[0-9a-f]{8}")
    rows(2).isNullAt(1) shouldBe true // empty shingle array -> null signature
  }

  it should "expose minhash_sig to SQL via registration" in {
    Native.register(spark)
    Seq((1L, Seq("x y z"))).toDF("doc_id", "sh").createOrReplaceTempView("native_sh")
    val r = spark.sql("SELECT minhash_sig(sh, 4) AS s FROM native_sh")
      .collect()(0).getSeq[String](0)
    r.length shouldBe 4
  }

  "NfcNormalize" should "compose decomposed sequences inside whole-stage codegen" in {
    val decomposed = "Cafe\u0301 du Monde" // e + combining acute (U+0301)
    val composed = "Caf\u00e9 du Monde"    // precomposed e-acute (U+00E9)
    // range() keeps the input non-local so ConvertToLocalRelation can't
    // pre-evaluate the projection — the codegen assertion stays meaningful
    val df = spark.range(1, 5).select(col("id"),
      when(col("id") === 1, lit(decomposed)).when(col("id") === 2, lit(composed))
        .when(col("id") === 3, lit("plain ascii"))
        .otherwise(lit(null).cast("string")).as("s"))
    val got = df.select(col("id"), Native.nfcNormalize(col("s")).as("n"))
    got.queryExecution.executedPlan.toString should include("*(1) Project")
    val rows = got.collect().sortBy(_.getLong(0))
    rows(0).getString(1) shouldBe composed     // normalized
    rows(1).getString(1) shouldBe composed     // already NFC: unchanged
    rows(2).getString(1) shouldBe "plain ascii"
    rows(3).isNullAt(1) shouldBe true
    // downstream consequence: identical rendering now hashes identically
    val hashes = got.where(col("id") <= 2)
      .select(md5(col("n"))).collect().map(_.getString(0)).distinct
    hashes.length shouldBe 1
  }

  it should "expose nfc_normalize to SQL and feed TextAnalysis.normalize" in {
    Native.register(spark)
    val raw = "  A\u030a  b   c " // A + combining ring (U+030A)
    Seq((1L, raw)).toDF("id", "s").createOrReplaceTempView("native_nfc")
    spark.sql("SELECT nfc_normalize(s) AS n FROM native_nfc")
      .head().getString(0) shouldBe "  \u00c5  b   c " // -> precomposed A-ring, case kept
    val full = Seq((1L, raw)).toDF("id", "s")
      .select(graft.ops.TextAnalysis.normalize(col("s")).as("n")).head().getString(0)
    full shouldBe "\u00e5 b c" // NFC + lower + trim + collapsed spaces
  }
}
