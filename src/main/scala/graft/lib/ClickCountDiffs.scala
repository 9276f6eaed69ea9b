package graft.lib

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Daily click-count differencing (reference
  * emma-examples ClickCountDiffs.scala:24-53: a per-day loop — aggregate
  * clicks per page, join against the previous day, write the diff).
  *
  * The reference works around its missing outer join with an inner equi-join
  * (its own comment at ClickCountDiffs.scala:39 admits "this is actually an
  * outer join"); here the diff is the correct full-outer with zero-fill, so
  * pages that appear or disappear between days count their full delta.
  */
object ClickCountDiffs {

  /** Count clicks per page for one day's log of page visits. */
  def dailyCounts(clicks: DataFrame): DataFrame =
    clicks.groupBy("page").agg(count(lit(1)).as("cnt"))

  /** Sum of |count_today - count_yesterday| over all pages (full outer,
    * absent = 0). */
  def dayDiff(today: DataFrame, yesterday: DataFrame): Long =
    today.select(col("page"), col("cnt").as("c1"))
      .join(yesterday.select(col("page"), col("cnt").as("c0")), Seq("page"), "full_outer")
      .select(abs(coalesce(col("c1"), lit(0L)) - coalesce(col("c0"), lit(0L))).as("d"))
      .agg(coalesce(sum("d"), lit(0L))).head().getLong(0)

  /** File-free core of the daily loop, for pre-split day frames (column
    * `page`): returns (day, total |Δ| vs the previous day) for every
    * consecutive pair. Each day's counts are materialized once (persist)
    * before the previous day's cache is dropped — the loop holds at most two
    * days of per-page counts, never the full history. */
  def diffs(days: Seq[(Int, DataFrame)]): Seq[(Int, Long)] = {
    var prev: Option[DataFrame] = None
    val out = Seq.newBuilder[(Int, Long)]
    for ((day, clicks) <- days) {
      val counts = dailyCounts(clicks).persist()
      prev.foreach { p =>
        out += ((day, dayDiff(counts, p)))
        p.unpersist()
      }
      prev = Some(counts)
    }
    prev.foreach(_.unpersist())
    out.result()
  }

  /** The reference's driver loop: for days 1..n read `<inDir>/clicks_<i>`
    * (parquet, column `page`), write per-day counts to
    * `<outDir>/counts_<i>`, and return (day, total_diff vs previous day). */
  def run(spark: SparkSession, inDir: String, numDays: Int, outDir: String): Seq[(Int, Long)] = {
    var prev: Option[DataFrame] = None
    val out = Seq.newBuilder[(Int, Long)]
    for (day <- 1 to numDays) {
      val counts = dailyCounts(spark.read.parquet(s"$inDir/clicks_$day")).persist()
      counts.write.mode("overwrite").parquet(s"$outDir/counts_$day")
      prev.foreach { p =>
        out += ((day, dayDiff(counts, p)))
        p.unpersist()
      }
      prev = Some(counts)
    }
    prev.foreach(_.unpersist())
    out.result()
  }
}
