package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus: Okapi BM25 scoring and top-k search
  * (Robertson & Walker SIGIR'94; the standard Lucene/Elasticsearch ranking
  * function, idf variant `ln(1 + (N - df + 0.5)/(df + 0.5))`).
  *
  * Scale design — the inverted-index join, not an index structure: the
  * corpus-side term relation (doc_id, token, tf) is the big operand and is
  * touched exactly once per query batch; the query-term relation and the
  * query-term document frequencies are tiny by construction and BROADCAST,
  * so the only shuffles are the two corpus-side aggregations (tf and dl,
  * both map-side combinable) and the final per-query score aggregation,
  * which is bounded by (queries × matching docs). Scores are micro-rounded
  * integers end-to-end (engine-portable, no float accumulation ordering).
  */
object Retrieval {

  /** Per-(query, doc) BM25 scores for every document that shares at least
    * one term with the query.
    *
    * `queries` is a small relation `(query_id, qtext)`; query terms are the
    * distinct whitespace tokens of `qtext`. Output: `(query_id, doc_id,
    * bm25_micros)` where `bm25_micros` is the integer sum of per-term
    * `floor(idf * tfnorm * 1e6 + 0.5)` contributions. */
  def bm25Scores(docs: DataFrame, queries: DataFrame, textCol: String = "text",
      qCol: String = "qtext", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = Par.spread(docs)
      .select(col("doc_id"), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
    // ONE corpus scan: tf is materialized once and every other relation
    // derives from it — dl = Σtf per doc, df = rows per token — so the raw
    // token relation (the widest in the pipeline) is never re-derived
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // corpus scalars: one row — stays a lazy broadcast, no driver collect
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col("query_id"), explode(split(trim(col(qCol)), "\\s+")).as("token"))
      .where(length(col("token")) > 0).distinct()
    // df restricted to query terms first, so the per-term df join is a
    // broadcast of |query vocabulary| rows, never the corpus vocabulary
    val qdf = dfreq.join(broadcast(qterms), "token")

    val joined = tf
      .join(broadcast(qdf), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    joined
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfn * lit(1000000.0) + lit(0.5)).cast("long").as("term_micros"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micros")).as("bm25_micros"))
  }

  /** Top-k documents per query under BM25, total-ordered by
    * `(bm25_micros desc, doc_id asc)` via the native [[graft.plans.TopK]]
    * partial-top-k operator (per-partition bounded heaps, no global sort). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      textCol: String = "text", qCol: String = "qtext",
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    graft.plans.TopK.perKey(
      bm25Scores(docs, queries, textCol, qCol, k1, b),
      Seq("query_id"), Seq(col("bm25_micros").desc, col("doc_id").asc), k)

  /** Per-query IR evaluation metrics over a ranked result list and a
    * binary-relevance truth set: capped recall@k
    * (`hits / min(|truth|, k)`), MRR (reciprocal of the first hit's
    * rank), and nDCG@k — the retrieval-quality scoreboard a RAG/training
    * pipeline runs after every index or ranking change.
    *
    * `results` is `(query_id, doc_id, rank)` (1-based), `truth` is
    * `(query_id, doc_id)`. All three metrics are emitted micro-rounded
    * (`floor(x·1e6 + 0.5)`) so the values are engine-exact; the ideal
    * DCG is a per-row left fold over `sequence(1, min(|truth|, k))` —
    * the same order any engine folds a list, so sub-ulp sum noise can't
    * survive the rounding. One join + one aggregation, both keyed by
    * query: |queries|·k rows in, |queries| rows out, corpus untouched. */
  def rankingMetrics(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val nTruth = truth.groupBy("query_id").agg(count(lit(1)).as("__nrel"))
    val hits = results.where(col("rank") <= k)
      .join(truth.withColumn("__rel", lit(1)), Seq("query_id", "doc_id"), "left")
    val per = hits.groupBy("query_id").agg(
      sum(coalesce(col("__rel"), lit(0))).as("__nhits"),
      min(when(col("__rel").isNotNull, col("rank"))).as("__first"),
      sum(when(col("__rel").isNotNull,
        lit(1.0) / log2(col("rank").cast("double") + lit(1.0)))
        .otherwise(lit(0.0))).as("__dcg"))
    def micros(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)).cast("long")
    val idcg = aggregate(
      sequence(lit(1L), least(col("__nrel"), lit(k.toLong))),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0)))
    per.join(nTruth, "query_id")
      .select(col("query_id"),
        micros(col("__nhits").cast("double") /
          least(col("__nrel"), lit(k.toLong)).cast("double")).as("recall_micros"),
        micros(coalesce(lit(1.0) / col("__first").cast("double"), lit(0.0)))
          .as("mrr_micros"),
        micros(col("__dcg") / idcg).as("ndcg_micros"))
  }

  /** Reciprocal-rank fusion of several per-query rankings — the standard
    * hybrid-retrieval combiner (lexical BM25 + dense ANN + anything else):
    * each input relation is `(query_id, doc_id, rank)` with rank 1-based;
    * a document scores `Σ floor(1e6 / (rrfK + rank))` over the lists that
    * ranked it, and the fused top-k is total-ordered by
    * `(rrf_micros desc, doc_id asc)`.
    *
    * Engine-portable by construction: the contribution is BIGINT integer
    * division, so any engine computes the identical fused score. Scale
    * shape: inputs are top-k lists (k·|queries| rows each — droplets at
    * any corpus size); fusion is one combinable aggregation plus the
    * bounded-heap top-k operator, no global sort, corpus untouched. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 0, s"rrfK must be non-negative: $rrfK")
    // floor of a correctly-rounded double division over small integers is
    // the exact rational floor (denominators ≤ rrfK + k can't produce a
    // near-integer quotient within rounding distance), so any engine
    // computes the identical contribution
    val contrib = rankings.map(_.select(col("query_id"), col("doc_id"),
        floor(lit(1000000.0) / (lit(rrfK.toDouble) + col("rank").cast("double")))
          .cast("long").as("__c")))
      .reduce(_.unionByName(_))
    val fused = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_micros"))
    graft.plans.TopK.perKey(fused,
      Seq("query_id"), Seq(col("rrf_micros").desc, col("doc_id").asc), k)
  }
}
