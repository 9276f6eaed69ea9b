package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime; explicit salting is the plan-level tool when one key dominates so
  * hard that even a split partition hot-spots, or when the join is
  * broadcast-ineligible. `saltedJoin` spreads each hot probe-side key over
  * `salt` shuffle partitions and replicates the (smaller) build side `salt`
  * ways — turning one hot reducer into `salt` even ones at the cost of a
  * `salt`× build-side blowup. Prefer AQE first; salt when metrics show a
  * single-reducer tail.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with `salt`-way salting. Result is
    * identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val salted = big.withColumn("_salt", (rand(42L) * salt).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-key frequency report to decide whether salting is needed:
    * (key, cnt) for the top `k` heaviest keys. */
  def topKeys(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc).limit(k)
}
