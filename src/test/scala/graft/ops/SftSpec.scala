package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Chat-template rendering and loss-mask spans: hand-computed goldens plus
  * the alignment property (every span extracts its turn's content verbatim
  * from the rendered conversation). */
class SftSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val turns = Seq(
    (1L, 0L, "user", "hello there"),
    (1L, 1L, "assistant", "hi"),
    (1L, 2L, "user", "bye"),
    (1L, 3L, "assistant", "see ya"),
    (2L, 0L, "user", "solo")
  ).toDF("conv", "turn", "role", "content")

  behavior of "Sft.renderConversations"

  it should "render ordered turns with role tags" in {
    val got = Sft.renderConversations(turns, "conv", "turn", "role", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got(1L) shouldBe "<|user|>hello there<|end|><|assistant|>hi<|end|>" +
      "<|user|>bye<|end|><|assistant|>see ya<|end|>"
    got(2L) shouldBe "<|user|>solo<|end|>"
  }

  it should "be order-insensitive to input row order" in {
    val shuffled = turns.orderBy(desc("content"))
    Sft.renderConversations(shuffled, "conv", "turn", "role", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Sft.renderConversations(turns, "conv", "turn", "role", "content")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  behavior of "Sft.lossSpans"

  it should "match hand-computed offsets" in {
    // turn0: hdr "<|user|>"=8 → [8,19); rendered len 8+11+7=26
    // turn1: hdr "<|assistant|>"=13 → [26+13, +2) = [39,41); len 22
    // turn2: [26+22+8, +3) = [56,59); len 18
    // turn3: [26+22+18+13, +6) = [79,85)
    val got = Sft.lossSpans(turns, "conv", "turn", "role", "content")
      .where(col("conv") === 1L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    got shouldBe Map(0L -> ((8L, 19L)), 1L -> ((39L, 41L)),
      2L -> ((56L, 59L)), 3L -> ((79L, 85L)))
  }

  it should "extract each turn's content verbatim from the rendered text" in {
    val rendered = Sft.renderConversations(turns, "conv", "turn", "role", "content")
    val spans = Sft.lossSpans(turns, "conv", "turn", "role", "content")
    val joined = spans.join(rendered, "conv")
      .join(turns, Seq("conv", "turn"))
      .select(col("conv"), col("turn"), col("content"),
        expr("substring(text, cast(start_off as int) + 1, cast(end_off - start_off as int))").as("cut"))
      .collect()
    joined should not be empty
    joined.foreach { r =>
      withClue(s"conv ${r.getLong(0)} turn ${r.getLong(1)}: ") {
        r.getString(3) shouldBe r.getString(2)
      }
    }
  }

  it should "keep spans aligned even with duplicate turn numbers" in {
    val dup = Seq((1L, 0L, "user", "aa"), (1L, 0L, "assistant", "b"),
      (1L, 1L, "user", "cc")).toDF("conv", "turn", "role", "content")
    val rendered = Sft.renderConversations(dup, "conv", "turn", "role", "content")
    val joined = Sft.lossSpans(dup, "conv", "turn", "role", "content")
      .join(rendered, "conv").join(dup, Seq("conv", "turn", "role"))
      .select(col("content"),
        expr("substring(text, cast(start_off as int) + 1, cast(end_off - start_off as int))").as("cut"))
      .collect()
    joined.length shouldBe 3
    joined.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  it should "count characters, not bytes" in {
    val uni = Seq((1L, 0L, "user", "héllo"), (1L, 1L, "assistant", "ok"))
      .toDF("conv", "turn", "role", "content")
    val got = Sft.lossSpans(uni, "conv", "turn", "role", "content")
      .where(col("turn") === 1L).collect().head
    // turn0 rendered = "<|user|>héllo<|end|>" = 8+5+7 = 20 chars
    got.getLong(3) shouldBe 20L + 13L
  }
}
