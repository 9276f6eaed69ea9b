package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism adaptivity for expensive per-row derivations.
  *
  * A small parquet input (one file, one row group) scans as ONE partition, so
  * every downstream narrow stage — shingling, hashing, regex scoring, vector
  * math — runs on one core until the first shuffle, no matter how many the
  * cluster has. [[spread]] round-robins such inputs up to the session's
  * default parallelism BEFORE the fan-out work; the shuffled payload is the
  * small raw input, not the (much larger) derived rows.
  *
  * At 100 TB this is a no-op: scans arrive in thousands of splits, so the
  * partition count already exceeds default parallelism and no exchange is
  * added. The helper only fires in the small-input/expensive-derivation
  * regime where it is the difference between 1× and N× cores.
  */
object Par {

  /** Repartition `df` to the default parallelism iff it currently has fewer
    * partitions; identity otherwise. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
