package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering pipeline (reference emma-lib ml/feature/tokenize.scala,
  * nGrams.scala, encode.scala — string → sparse-vector hashing-trick
  * pipeline). Original columnar formulation: the sparse representation is the
  * distributed-friendly long form `(id, index, value)` — one row per nonzero —
  * so at 100 TB the encode stage is explode + one hash aggregation, never a
  * per-row dense vector.
  */
object Features {

  /** Split on a gap pattern (reference tokenize.gaps). */
  def tokenizeGaps(text: Column, gapPattern: String = "\\s+"): Column =
    filter(split(trim(text), gapPattern), t => length(t) > 0)

  /** Keep word matches (reference tokenize.words). */
  def tokenizeWords(text: Column, wordPattern: String = "[a-zA-Z0-9']+"): Column =
    regexp_extract_all(text, lit(wordPattern), lit(0))

  /** Word n-grams of a token array (reference nGrams.scala:22-45). */
  def nGrams(tokens: Column, n: Int): Column =
    graft.ops.Dedup.nGramsOfTokens(tokens, n)

  /** Hashing-trick term frequencies in long form: (id, index, tf) with
    * index = pmod(xxhash64(token), numFeatures) (reference encode.freq —
    * hashing-trick encoder). */
  def hashTF(docs: DataFrame, idCol: String, tokensCol: String,
      numFeatures: Int = 1 << 18): DataFrame =
    graft.ops.Par.spread(docs)
      .select(col(idCol).as("id"), explode(col(tokensCol)).as("tok"))
      .select(col("id"), pmod(xxhash64(col("tok")), lit(numFeatures.toLong)).as("index"))
      .groupBy("id", "index").agg(count(lit(1)).cast("double").as("tf"))

  /** Binary (presence) encoding (reference encode.bin). */
  def hashBin(docs: DataFrame, idCol: String, tokensCol: String,
      numFeatures: Int = 1 << 18): DataFrame =
    hashTF(docs, idCol, tokensCol, numFeatures)
      .withColumn("tf", lit(1.0))

  /** TF-IDF over the long form: idf = ln((N+1)/(df+1)) + 1. */
  def tfIdf(tf: DataFrame, nDocs: Long): DataFrame = {
    val df = tf.groupBy("index").agg(countDistinct("id").as("df"))
    tf.join(broadcast(df), "index")
      .select(col("id"), col("index"),
        (col("tf") * (log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0)).as("tf"))
  }

  /** Term-level TF-IDF (no hashing trick): one row per (doc, term) with
    * weight tf·(ln((N+1)/(df+1))+1), rounded for cross-engine comparison.
    * Same shuffle shape as [[hashTF]]+[[tfIdf]] — two aggregations and an
    * equi-join on the term — but the feature key is the term itself, so the
    * result is directly interpretable (and oracle-checkable). */
  def tfIdfTerms(docs: DataFrame, idCol: String, textCol: String, nDocs: Long): DataFrame = {
    val tf = graft.ops.Par.spread(docs)
      .select(col(idCol).as("id"), explode(tokenizeGaps(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfr, "term")
      .select(col("id"), col("term"),
        graft.ops.Portable.round(
          col("tf").cast("double") *
            (log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("w"))
  }

  /** Dictionary (index) encoding of a categorical column: dense 0-based codes
    * by frequency desc then value asc (reference encode.dict/index —
    * deterministic). Returns (value, code); broadcast-join it onto data.
    *
    * The global dense numbering is a range-partitioned sort +
    * `zipWithIndex`, NOT a partition-less window: a high-cardinality
    * dictionary (urls, tokens) would funnel every distinct value through
    * one task under `row_number() over (order by ...)`, while the sort +
    * zip stays distributed at any cardinality. */
  def dictionary(docs: DataFrame, valueCol: String): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs.groupBy(col(valueCol).as("value")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value").asc)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      counts.schema("value"),
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    // zipWithIndex respects the sorted RDD's partition order, so indices are
    // the same dense ranks the window produced — without the 1-task stage
    val rows = counts.select("value").rdd.zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i.toInt) }
    spark.createDataFrame(rows, schema)
  }

  /** k-fold assignment (reference ml/kfold.scala:24-50 — seeded deterministic
    * fold per element): fold = pmod(xxhash64(id, seed), k). */
  def kfold(docs: DataFrame, idCol: String, k: Int, seed: Long = 42L): DataFrame =
    docs.withColumn("fold",
      pmod(xxhash64(col(idCol), lit(seed)), lit(k.toLong)).cast("int"))

  /** Training split for fold i (reference kfold.except). */
  def kfoldExcept(withFolds: DataFrame, i: Int): DataFrame =
    withFolds.where(col("fold") =!= i)

  /** Validation split for fold i (reference kfold.select). */
  def kfoldSelect(withFolds: DataFrame, i: Int): DataFrame =
    withFolds.where(col("fold") === i)
}
