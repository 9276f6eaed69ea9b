package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning (chat) data preparation: render a turns table
  * into one training string per conversation, and compute the character
  * spans the loss mask should keep (the assistant turns' content).
  *
  * Template: every turn renders as `<|role|>content<|end|>` (tags
  * configurable). Offsets are 0-based CHARACTER offsets into the rendered
  * conversation — `[start_off, end_off)` covers exactly the turn's content;
  * with SQL's 1-based substring that is
  * `substring(text, start_off + 1, end_off - start_off)` (SftSpec pins the
  * alignment) — so a tokenizer downstream can map spans to token masks
  * without re-scanning the template.
  *
  * Everything is closed-form relational: rendering is an ordered
  * per-conversation concat (one shuffle on the conversation key; a
  * conversation's turns are bounded, so no group is large), and spans come
  * from ONE window prefix-sum over rendered-turn lengths on the same
  * partitioning — at 100 TB both ops shuffle each turn's text exactly once,
  * and the two outputs share their exchange when composed.
  */
object Sft {

  /** One turn's rendered text: `<|role|>content<|end|>`. */
  def renderedTurn(role: Column, content: Column,
      openTag: String = "<|", closeTag: String = "|>",
      eot: String = "<|end|>"): Column =
    concat(lit(openTag), role, lit(closeTag), content, lit(eot))

  /** Render each conversation to a single training string: turns ordered by
    * `turnCol`, each as `<|role|>content<|end|>`, concatenated. Output:
    * `(conv, text)`. */
  def renderConversations(turns: DataFrame, convCol: String, turnCol: String,
      roleCol: String, contentCol: String,
      openTag: String = "<|", closeTag: String = "|>",
      eot: String = "<|end|>"): DataFrame = {
    val rt = renderedTurn(col(roleCol), col(contentCol), openTag, closeTag, eot)
    turns
      .select(col(convCol).as("conv"), struct(col(turnCol).as("t"),
        rt.as("rt")).as("s"))
      .groupBy("conv")
      .agg(array_join(transform(array_sort(collect_list(col("s"))),
        x => x.getField("rt")), "").as("text"))
  }

  /** Per-turn content spans in the rendered conversation:
    * `(conv, turn, role, start_off, end_off)` with
    * `start_off = Σ len(rendered earlier turns) + len(header)` and
    * `end_off = start_off + len(content)` — one window prefix-sum, no
    * self-join against the rendered text. Filter `role` downstream for the
    * loss mask (keep assistant spans, drop the rest). */
  def lossSpans(turns: DataFrame, convCol: String, turnCol: String,
      roleCol: String, contentCol: String,
      openTag: String = "<|", closeTag: String = "|>",
      eot: String = "<|end|>"): DataFrame = {
    val rt = renderedTurn(col(roleCol), col(contentCol), openTag, closeTag, eot)
    val hdrLen = length(concat(lit(openTag), col(roleCol), lit(closeTag)))
    // tie-break duplicate turn numbers by the rendered text — the SAME
    // order array_sort gives renderConversations' struct(t, rt), so spans
    // stay aligned (and deterministic) even on pathological input
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convCol)).orderBy(col(turnCol), rt)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val start = (coalesce(sum(length(rt)).over(w), lit(0L)) + hdrLen.cast("long"))
    turns.select(col(convCol).as("conv"), col(turnCol).as("turn"),
      col(roleCol).as("role"),
      start.as("start_off"),
      (start + length(col(contentCol)).cast("long")).as("end_off"))
  }
}
