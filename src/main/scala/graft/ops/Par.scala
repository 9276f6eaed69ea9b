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

  /** Repartition `df` to the default parallelism iff its PLANNING-TIME size
    * estimate says the scan would open with fewer partitions; identity
    * otherwise.
    *
    * The estimate comes from `optimizedPlan.stats.sizeInBytes` — pure
    * planning, never executes the plan. (A `df.rdd.getNumPartitions` probe
    * would materialize AQE's final plan, eagerly RUNNING every upstream
    * shuffle stage just to read a partition count, then the real query would
    * re-execute the same stages.) Unknown sizes default to huge → no-op,
    * which is the safe direction: a genuinely large input already scans in
    * many splits. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val perPartition = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(target) * perPartition) df.repartition(target) else df
  }
}
