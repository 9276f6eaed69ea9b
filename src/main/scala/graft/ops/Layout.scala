package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan locality at scale. A 100 TB table is only
  * as fast as what a query can SKIP: range-partitioning and sorting files by
  * a space-filling curve gives every file a narrow min/max envelope in every
  * interleaved dimension, so predicate pushdown on any of them prunes files.
  * Beyond-reference addition (the reference has no storage layout control).
  */
object Layout {

  /** Morton (Z-order) value: interleave the low `bits` bits of each
    * non-negative integral column — bit `b` of column `j` lands at position
    * `b * cols.size + j`. Pure bit arithmetic on longs, codegen-friendly,
    * reproducible in any engine with shifts and AND. Requires
    * `bits * cols.size <= 62`. */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62,
      s"need 1..62/${cols.size} bits, got $bits")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(1L), b * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hive-style directory partitioning — the coarse half of scan pruning:
    * a filter on a partition column is resolved against directory names at
    * planning time (`PartitionFilters` in the scan), so other partitions'
    * files are never opened. At 100 TB this is the difference between
    * scanning one partition and listing the world; pair with [[zorderBy]]
    * inside each partition for fine-grained row-group skipping. */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Cluster a frame by the Z-order of `cols` into `numFiles` range
    * partitions, each sorted internally — the write-side half of scan
    * pruning: per-file z ranges are disjoint, and every interleaved
    * dimension's per-file min/max envelope narrows with file count. */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zorderValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Small-file compaction: rewrite a parquet directory so each output file
    * holds ~`targetBytes` of on-disk data — the maintenance pass every
    * long-lived ingested table needs (streaming sinks and per-batch appends
    * leave thousands of KB-size files whose open/footer overhead dominates
    * scans; at 100 TB an uncompacted table can spend more time listing and
    * opening files than reading them).
    *
    * File count is sized from the CURRENT on-disk bytes (so compression
    * ratio carries over), rows are round-robin repartitioned (uniform
    * output sizes regardless of input skew), and the rewrite goes to a new
    * directory — swap-on-success, never in place. Returns the output file
    * count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes >= 1, s"targetBytes must be positive: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(conf)
    // FLAT directories only: a Hive-partitioned layout would silently have
    // its partition columns flattened into data columns on rewrite and the
    // non-recursive output listing would be wrong — fail loudly instead
    // (compact each leaf partition directory separately).
    val subDirs = fs.listStatus(in).filter(_.isDirectory).map(_.getPath.getName)
    require(subDirs.isEmpty,
      s"compact() requires a flat (non-partitioned) directory; found " +
        s"subdirectories under $inDir: ${subDirs.take(3).mkString(", ")}")
    val bytes = fs.getContentSummary(in).getLength
    val numFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(numFiles)
      .write.mode("overwrite").parquet(outDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    fs.listStatus(out).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
