package graft.lib

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.DataBag
import graft.api.alg.{Alg2, Size, Sum}

/** Text workloads from the reference's example suite. */
object TextPipelines {

  /** WordCount (reference emma-examples text/WordCount.scala:24-37):
    * readText → flatMap(split) → groupBy word → count. Columnar fast path:
    * explode + hash aggregate (map-side combine). */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.ops.Par.spread(docs)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Typed DataBag formulation of the same pipeline (the reference's exact
    * shape), used by the differential spec to pin both paths to one result. */
  def wordCountTyped(lines: DataBag[String]): DataBag[(String, Long)] = {
    val spark = lines.spark
    import spark.implicits._
    lines
      .flatMap(_.split("\\s+").toSeq)
      .withFilter(_.nonEmpty)
      .foldGroup[String, Long](identity, Size)
      .map(g => (g.key, g.values))
  }
}

/** Single-pass multi-statistic folds (reference emma-lib stats/stat.scala:23-67;
  * the AlgN banana-fusion use case — N statistics, one job). */
object Stats {

  /** count/mean/variance/stddev/min/max of a numeric column in ONE pass
    * (columnar: one hash-free partial aggregation). */
  def describe(df: DataFrame, c: String): DataFrame =
    df.agg(
      count(col(c)).as("n"),
      round(avg(col(c)), 4).as("mean"),
      round(var_samp(col(c)), 2).as("variance"),
      round(stddev_samp(col(c)), 4).as("stddev"),
      min(col(c)).as("mn"),
      max(col(c)).as("mx"))

  /** Engine-portable describe: the order-dependent double sums are bridged
    * through EXACT decimal aggregation (integer-valued columns stay exact
    * through x·x), then mean/variance/stddev are a FIXED sequence of IEEE
    * double ops on those exact sums — bit-identical on any engine, unlike
    * [[describe]]'s native var_samp whose partial-merge order varies. */
  def describeExact(df: DataFrame, c: String): DataFrame = {
    val x = col(c)
    val varExpr =
      (col("sumsq") - ((col("mean") * col("mean")) * col("n"))) / (col("n") - 1)
    df.agg(
        count(x).as("n"),
        sum(x.cast("decimal(18,4)")).cast("double").as("sum_x"),
        sum((x * x).cast("decimal(28,8)")).cast("double").as("sumsq"),
        min(x).as("mn"), max(x).as("mx"))
      .withColumn("mean", col("sum_x") / col("n"))
      .select(col("n"), col("mean"), varExpr.as("variance"),
        sqrt(varExpr).as("stddev"), col("mn"), col("mx"))
  }

  /** Typed single-pass (count, sum) via a product algebra — demonstrates the
    * Alg2 fusion path on arbitrary Scala monoids. */
  def countAndSum(bag: DataBag[Double]): (Long, Double) =
    bag.fold(Alg2(Size, Sum(implicitly[Numeric[Double]])))

  /** Per-DIMENSION stats of a vector column (the reference's `stat` over
    * `DVector`, stats/stat.scala:23-67): (dim, n, sum, sumsq, min, max) in
    * micro-unit integers — each float is micro-rounded BEFORE summing, so
    * every aggregate is an exact, order-independent integer (engine-portable;
    * mean/variance are one division away in the caller's precision of
    * choice).
    *
    * Shape: posexplode + one map-side-combinable aggregation keyed by
    * dimension index. The shuffle carries ≤ dims × partitions partial rows —
    * independent of row count — so it scales like a global agg, not a join.
    * sumsq bound: |x| ≤ ~9.2·10⁵ keeps micro² sums inside int64 for up to
    * ~10¹² rows per dimension. */
  def describeVector(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    graft.ops.Par.spread(df)
      .select(posexplode(col(vecCol)))
      .select(col("pos").as("dim"),
        floor(col("col").cast("double") * 1e6 + 0.5).cast("long").as("micros"))
      .groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum("micros").as("sum_micros"),
        sum(col("micros") * col("micros")).as("sumsq_micros2"),
        min("micros").as("min_micros"),
        max("micros").as("max_micros"))
}
