package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training.
  *
  * Works on the DISTINCT-WORD relation `(syms: Array[String], cnt)` — the
  * standard BPE reduction: after one word-count aggregation, every round's
  * cost depends on vocabulary size, not corpus size, so a 100 TB corpus
  * trains at the same per-round cost as its word histogram (~millions of
  * rows), kept distributed the whole time.
  *
  * Per round: ONE map-side-combinable aggregation (adjacent-pair counts,
  * weighted by word count), a single-row argmax collect (the winning pair —
  * ties broken lexicographically so the merge sequence is a pure function
  * of the corpus), and a narrow fold that merges the winner left-to-right
  * non-overlapping inside each word (a codegen'd `aggregate` higher-order
  * function — no UDF). Training stops early when no pair occurs twice.
  *
  * The learned artifact is the ranked merge table `(rank, left, right,
  * pair_count)` — apply it with [[encode]].
  */
object Bpe {

  /** Initial word relation: whitespace words → (syms = chars, cnt). */
  def wordSymbols(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spread(docs)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))

  /** Greedy left-to-right non-overlapping merge of (l, r) in a symbol
    * array — the textbook BPE application step, as a pure Column fold. */
  private[ops] def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Train `numMerges` merges. Returns the ranked merge table and the final
    * merged word relation `(syms, cnt)` (for inspection / token counts). */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 50)
      : (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = docs.sparkSession
    val bridge = org.apache.spark.sql.graft.bridge
    var words = bridge.dropOriginStats(
      wordSymbols(docs, textCol).localCheckpoint())
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = words
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
          .as(Seq("i", "l")), col("syms"), col("cnt"))
        .select(col("l"), element_at(col("syms"), col("i") + 2).as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = bridge.dropOriginStats(
          words.select(mergePair(col("syms"), l, r).as("syms"), col("cnt"))
            .localCheckpoint())
        bridge.freeLocalCheckpoint(words)
        words = next
        rank += 1
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("rank", "left", "right", "pair_count"), words)
  }

  /** Apply a DRIVER-SIDE merge list (the collected merge table, in rank
    * order) to a fresh corpus: the production encode path — merges are a
    * broadcast-scale artifact; application is one narrow map per merge,
    * fused by codegen into a single pass over each word. */
  def encode(docs: DataFrame, mergeList: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val words = Par.spread(docs)
      .select(col("doc_id"), posexplode(split(trim(col(textCol)), "\\s+"))
        .as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
    val merged = mergeList.foldLeft(split(col("w"), "")) {
      case (c, (l, r)) => mergePair(c, l, r)
    }
    words.select(col("doc_id"), col("pos"), merged.as("tokens"))
  }
}
