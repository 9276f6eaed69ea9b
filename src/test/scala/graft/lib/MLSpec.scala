package graft.lib

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class MLSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "Features.tokenize + nGrams + hashTF" should "build long-form features" in {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("id", "text")
      .select(col("id"), Features.tokenizeGaps(col("text")).as("toks"))
    val grams = docs.select(col("id"), Features.nGrams(col("toks"), 2).as("g"))
      .where(col("id") === 1).head().getSeq[String](1)
    grams shouldBe Seq("a b", "b a")
    val tf = Features.hashTF(docs, "id", "toks", numFeatures = 64)
    val d1 = tf.where(col("id") === 1).collect()
    d1.map(_.getDouble(2)).sorted shouldBe Array(1.0, 2.0) // a:2, b:1
    // same token hashes to the same index across docs
    val idxA = tf.where(col("id") === 1 && col("tf") === 2.0).head().getLong(1)
    tf.where(col("id") === 2).collect().map(_.getLong(1)) should not contain idxA
  }

  "Features.dictionary" should "code by frequency desc then value asc" in {
    val d = Seq("x", "y", "y", "z", "y", "x").toDF("v")
    val dict = Features.dictionary(d, "v").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    dict shouldBe Map("y" -> 0, "x" -> 1, "z" -> 2)
  }

  "Features.kfold" should "partition disjointly and deterministically" in {
    val d = (1L to 100L).toDF("id")
    val folded = Features.kfold(d, "id", 5).persist()
    Features.kfoldSelect(folded, 0).count() +
      Features.kfoldExcept(folded, 0).count() shouldBe 100
    val again = Features.kfold(d, "id", 5)
    folded.select("id", "fold").except(again.select("id", "fold")).count() shouldBe 0
    folded.select("fold").distinct().count() shouldBe 5
  }

  "ML.naiveBayes" should "classify clearly separable token distributions" in {
    val train = Seq(
      (1L, "spam buy now cheap buy"), (2L, "spam cheap offer buy"),
      (3L, "ham meeting notes agenda"), (4L, "ham agenda project notes"))
      .toDF("id", "text")
    val labels = Seq((1L, "spam"), (2L, "spam"), (3L, "ham"), (4L, "ham")).toDF("id", "label")
    val feats = Features.hashTF(
      train.select(col("id"), Features.tokenizeGaps(col("text")).as("toks")),
      "id", "toks", numFeatures = 256)
    val model = ML.naiveBayesFit(feats, labels, numFeatures = 256)
    val test = Seq((10L, "buy cheap now"), (11L, "project meeting agenda"),
      (12L, "unknownword otherunknown")).toDF("id", "text")
    val testFeats = Features.hashTF(
      test.select(col("id"), Features.tokenizeGaps(col("text")).as("toks")),
      "id", "toks", numFeatures = 256)
    val pred = ML.naiveBayesPredict(testFeats, model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pred(10L) shouldBe "spam"
    pred(11L) shouldBe "ham"
    // doc of entirely-unseen tokens scores via the smoothing floor for BOTH
    // labels (not silently 0) and still yields a prediction
    pred.contains(12L) shouldBe true
  }

  "ML.linreg" should "recover y = 2x + 1" in {
    val data = (0 until 50).map(i => (i.toLong, Array(i / 25.0), 2.0 * (i / 25.0) + 1.0))
      .toDF("id", "x", "y")
    val (w, b, losses) = ML.linreg(data, dim = 1, lr = 0.8, iters = 120)
    w(0) shouldBe 2.0 +- 0.15
    b shouldBe 1.0 +- 0.15
    losses.last should be < losses.head
  }

  "ML.logreg + evalBinary" should "separate a 1-d threshold problem" in {
    val data = (0 until 40).map { i =>
      val x = i / 20.0 - 1.0 // [-1, 1)
      (i.toLong, Array(x), if (x > 0) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val (w, b, _) = ML.logreg(data, dim = 1, lr = 1.0, iters = 80)
    val scored = ML.predictLinear(data, w, b, logistic = true)
      .join(data.select(col("id"), col("y").as("label")), "id")
      .select(col("label").cast("int").as("label"),
        when(col("pred") > 0.5, 1).otherwise(0).as("pred"))
    val m = ML.evalBinary(scored).head()
    m.getAs[Double]("accuracy") should be > 0.9
    m.getAs[Double]("f1") should be > 0.9
  }

  "ML.svm (hinge)" should "separate a 1-d threshold problem by margin sign" in {
    val data = (0 until 40).map { i =>
      val x = i / 20.0 - 1.0
      (i.toLong, Array(x), if (x > 0) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val (w, b, losses) = ML.svm(data, dim = 1, lr = 1.0, iters = 80, l2 = 0.001)
    val scored = ML.predictLinear(data, w, b) // raw margin
      .join(data.select(col("id"), col("y").cast("int").as("label")), "id")
      .select(col("label"), when(col("pred") > 0.0, 1).otherwise(0).as("pred"))
    ML.evalBinary(scored).head().getAs[Double]("accuracy") should be > 0.9
    losses.last should be < losses.head
  }

  "ML.gd with l2" should "shrink weights versus the unregularized fit" in {
    val data = (0 until 50).map(i => (i.toLong, Array(i / 25.0), 2.0 * (i / 25.0) + 1.0))
      .toDF("id", "x", "y")
    val (w0, _, _) = ML.linreg(data, dim = 1, lr = 0.8, iters = 120)
    val (wr, _, _) = ML.linreg(data, dim = 1, lr = 0.8, iters = 120, l2 = 0.5)
    math.abs(wr(0)) should be < math.abs(w0(0))
  }

  "ML.evalRegression" should "compute se/mse/rmse in one pass" in {
    val scored = Seq((1.0, 2.0), (3.0, 3.0), (0.0, 2.0)).toDF("y", "pred")
    val m = ML.evalRegression(scored).head()
    m.getAs[Long]("n") shouldBe 3L
    m.getAs[Double]("se") shouldBe 5.0 +- 1e-12  // 1 + 0 + 4
    m.getAs[Double]("mse") shouldBe (5.0 / 3) +- 1e-12
    m.getAs[Double]("rmse") shouldBe math.sqrt(5.0 / 3) +- 1e-12
  }
}
