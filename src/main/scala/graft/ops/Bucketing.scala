package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for repeated co-located joins.
  *
  * Writing both sides bucketed+sorted by the join key lets every subsequent
  * join run shuffle-free: the sort-merge join reads co-located buckets
  * directly (no Exchange in the plan). This is the storage-level answer to
  * "this join runs every hour at 100 TB" — pay the shuffle once at write
  * time, never again at read time.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
