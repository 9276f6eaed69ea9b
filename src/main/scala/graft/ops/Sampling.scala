package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — membership is a pure function of
  * a key column, so the SAME rows are selected on any engine, any partition
  * layout, any cluster size. Complements `DataBag.sample` (the reference's
  * seeded reservoir, exact-k but engine-specific): these are the samplers a
  * training-data pipeline wants at 100 TB — no shuffle, no driver state, no
  * coordination; the filter is a codegen'd Column predicate evaluated at the
  * scan, and the expected fraction holds per-partition.
  *
  * Mechanism: the first 8 hex chars of `md5(key)` are a uniform 32-bit value;
  * comparing the FIXED-WIDTH lowercase hex string lexicographically against a
  * threshold prefix equals comparing the numbers — and `md5` + string compare
  * reproduce bit-for-bit in any engine (DuckDB, Trino, Spark...).
  */
object Sampling {

  /** 8-hex-char lowercase threshold for a fraction in [0, 1]. */
  private[ops] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** The uniform hex draw for a key column (shared with the oracle SQL:
    * `substring(md5(cast(key as varchar)), 1, 8)`). */
  def hashDraw(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Keep-predicate for one fraction. `fraction >= 1.0` must keep EVERY row —
    * the strict `<` against the clamped max threshold would silently drop keys
    * whose draw is exactly "ffffffff" (~1 per 4.3e9 rows; thousands at 100 TB,
    * and a split built from f and 1-f would no longer partition the data). */
  private def keep(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else hashDraw(key) < lit(thresholdHex(fraction))

  /** Bernoulli sample: keep each row with probability ~`fraction`,
    * deterministically by `key`. Rows sharing a key are kept or dropped
    * together (handy for leakage-free train/eval splits). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(keep(key, fraction))

  /** Disjoint, total train/val/test split: labels each row by where its
    * hash draw falls among cumulative fraction thresholds. Deterministic and
    * engine-portable like [[hashSample]]; rows sharing a key land in the
    * same split (leakage-free by construction). The LAST split is the
    * `otherwise` branch, so every row is labeled no matter how the
    * fractions round — the splits partition the data exactly.
    *
    * @param splits ordered (label, fraction); fractions must sum to ~1
    */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1: $total")
    val draw = hashDraw(key)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = splits.init.zip(cums.init) match {
      case Seq() => lit(splits.last._1)
      case ((l0, _), c0) +: rest =>
        rest.foldLeft(when(draw < lit(thresholdHex(c0)), l0)) {
          case (acc, ((l, _), c)) => acc.when(draw < lit(thresholdHex(c)), l)
        }.otherwise(splits.last._1)
    }
    df.withColumn("split", label)
  }

  /** Stratified Bernoulli sample: per-stratum fractions, same deterministic
    * draw. Strata missing from `fractions` are dropped. */
  def stratifiedHashSample(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty, "fractions must not be empty")
    val pred = fractions.foldLeft(lit(false)) {
      case (acc, (stratum, f)) =>
        when(strata === stratum, keep(key, f)).otherwise(acc)
    }
    df.where(pred)
  }

  /** The hex draw as an exact uniform in (0, 1): the 32-bit value of the
    * first 8 md5 hex chars, offset by 0.5 so u is never 0 (ln(u) stays
    * finite) and never 1. `conv(hex,16,10)` is exact, and an oracle can
    * reproduce the identical double with a positional digit sum (integers
    * below 2^53 are exact in IEEE-754 on both sides). */
  def uniformDraw(key: Column): Column =
    (conv(hashDraw(key), 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES): each
    * row draws priority u^(1/w) — equivalently ordered by ln(u)/w — and the
    * k largest priorities win, so inclusion probability is proportional to
    * `weight` (w > 0). Deterministic AND engine-portable: u is a pure
    * function of `key`, so the same rows win on any engine at any
    * parallelism (ties on the priority are broken by `key`; the only
    * cross-engine wobble would be a sub-ulp ln() difference on a near-exact
    * priority tie, measure-zero on real data).
    *
    * Scale: `orderBy(priority).limit(k)` plans as TakeOrderedAndProject —
    * a size-k heap per partition, then a driver merge of per-partition
    * winners. No global sort, no shuffle of the data; 100 TB in, k rows
    * out. For k beyond driver memory use `TopKPerKey` with a constant key. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.withColumn("__pri", log(uniformDraw(key)) / weight.cast("double"))
      .orderBy(desc("__pri"), key.asc)
      .limit(k)
      .drop("__pri")
  }

  /** Shared membership tail of the domain-mixing ops: `frac` is a
    * `(__domain, __f)` relation (one row per domain, fraction in [0, 1]);
    * keep each row of `df` whose md5 draw clears its domain's 32-bit
    * threshold. The `__f >= 1.0` disjunct is NOT redundant: a fraction of
    * exactly 1.0 floors to threshold "ffffffff"+1 clamped to "ffffffff",
    * which a draw of "ffffffff" would fail — keep-all must not drop that
    * one draw. One definition so the clamp/keep-all subtleties cannot
    * drift between [[domainMix]] and [[temperatureMix]]. */
  private def keepByFraction(df: DataFrame, frac: DataFrame, domainCol: String,
      key: Column): DataFrame = {
    val thresholdHexCol = format_string("%08x",
      least(floor(col("__f") * lit(4294967296.0)).cast("long"), lit(4294967295L)))
    df.join(broadcast(frac), col(domainCol) === col("__domain"))
      .where(col("__f") >= 1.0 || hashDraw(key) < thresholdHexCol)
      .drop("__domain", "__f")
  }

  /** Domain mixing: sample the corpus toward a TARGET distribution —
    * `targets(domain)` is the desired weight of each domain in an output of
    * ~`targetTotal` rows, so each domain keeps fraction
    * `min(1, weight * targetTotal / count(domain))` of its rows. Domains
    * without a target weight are dropped.
    *
    * Per-domain fractions are computed IN the plan (tiny count aggregate +
    * broadcast join back) — no driver collect, no coordination — and
    * membership stays a pure function of (domain stats, key), so the same
    * rows are kept on any engine at any parallelism. The fraction→threshold
    * arithmetic (`least(1, (w * total) / cnt)`, then
    * `least(floor(f * 2^32), 2^32-1)` rendered as 8 lowercase hex chars) is
    * written in the exact operation order an ANSI oracle can replicate. */
  def domainMix(df: DataFrame, domainCol: String, key: Column,
      targets: Map[String, Double], targetTotal: Long): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val tg = targets.toSeq.toDF("__domain", "__w")
    val frac = df.groupBy(col(domainCol).as("__domain"))
      .agg(count(lit(1)).as("__cnt"))
      .join(tg, "__domain")
      .select(col("__domain"),
        least(lit(1.0), col("__w") * lit(targetTotal.toDouble) /
          col("__cnt").cast("double")).as("__f"))
    keepByFraction(df, frac, domainCol, key)
  }

  /** Temperature-scaled domain mixing — [[domainMix]] with the target
    * weights DERIVED from the corpus itself: `w_d ∝ count_d^alpha`
    * (renormalized), the standard multinomial temperature reweighting for
    * multi-source training mixes (`alpha = 1/T`; `alpha = 1` keeps the
    * natural distribution, `alpha → 0` flattens toward uniform, so
    * low-resource domains are upweighted relative to their share). Each
    * domain then keeps fraction `min(1, w_d · targetTotal / count_d)` of
    * its rows via the same md5-threshold membership as [[domainMix]].
    *
    * Everything stays IN the plan: one K-row count aggregate, a 1-row sum
    * of the tempered weights, and a broadcast join back — no driver
    * collect, no coordination; membership is a pure function of
    * (corpus domain counts, alpha, key). For engine portability the
    * tempered count uses `sqrt` when `alpha = 0.5` (IEEE-exact in every
    * engine, unlike `pow`) and the final fraction is rounded to 6 decimals
    * BEFORE the 32-bit threshold is derived, so a sub-ulp disagreement in
    * the K-term weight sum cannot shift the membership threshold. */
  def temperatureMix(df: DataFrame, domainCol: String, key: Column,
      alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val cnt = df.groupBy(col(domainCol).as("__domain"))
      .agg(count(lit(1)).as("__cnt"))
    val tempered =
      if (alpha == 0.5) sqrt(col("__cnt").cast("double"))
      else if (alpha == 1.0) col("__cnt").cast("double")
      else pow(col("__cnt").cast("double"), lit(alpha))
    val weighted = cnt.withColumn("__p", tempered)
    val total = weighted.agg(sum(col("__p")).as("__t"))
    val frac = weighted.crossJoin(broadcast(total))
      .select(col("__domain"),
        Portable.round(
          least(lit(1.0), col("__p") / col("__t") * lit(targetTotal.toDouble) /
            col("__cnt").cast("double")), 6).as("__f"))
    keepByFraction(df, frac, domainCol, key)
  }

  /** Deterministic fractional UPSAMPLING — the repetition side of data
    * mixing ([[domainMix]] only downsamples): each row is emitted
    * `floor(factor)` times, tagged `epoch` 0..floor-1, plus once more in
    * the final PARTIAL epoch iff its seeded hash clears the fractional
    * threshold (E[rows out] = factor · rows in; factor < 1 degenerates to
    * a seeded Bernoulli). Partial-epoch membership is a pure function of
    * (seed, key), so a re-run or resumed job materializes the identical
    * stream on any engine at any parallelism. The explode is NARROW — no
    * shuffle at any factor — and the epoch column keeps copies
    * distinguishable downstream: feed (key, epoch) as the training-order
    * key of [[Shuffling.deterministicShuffle]] so a document's copies
    * spread through the run instead of clustering back to back. */
  def upsampleDeterministic(df: DataFrame, key: Column, factor: Double,
      seed: Long): DataFrame = {
    require(factor > 0.0 && factor <= 1024.0, s"factor must be in (0, 1024]: $factor")
    val whole = math.floor(factor).toLong
    val fracThr = thresholdHex(factor - whole)
    epochExplode(df, lit(whole), lit(fracThr), seededDraw(key, seed))
  }

  /** The seeded md5 draw shared by every per-key epoch sampler. */
  private[ops] def seededDraw(key: Column, seed: Long): Column =
    substring(md5(concat_ws("-", lit(seed), key.cast("string"))), 1, 8)

  /** Shared epoch-explode tail of the deterministic upsamplers
    * ([[upsampleDeterministic]], [[Mixture.applyAllocation]]): emit each
    * row once per whole epoch (`epoch` 0..whole−1) plus one final partial
    * epoch iff `draw` clears the 8-hex threshold — ONE definition so the
    * draw/threshold contract cannot drift between the fixed-factor and
    * per-domain variants. The explode is narrow (no shuffle). */
  private[ops] def epochExplode(df: DataFrame, whole: Column,
      thrHex: Column, draw: Column): DataFrame =
    df.withColumn("epoch", explode(sequence(lit(0L), whole)))
      .where(col("epoch") < whole || draw < thrHex)

  /** EXACT k rows per group, deterministic and engine-portable: rank rows
    * within each group by the md5 draw of their key (tie-broken by the key
    * itself — pass a unique id) and keep the k smallest. Unlike the
    * fraction-based [[stratifiedHashSample]], group sizes are exact; unlike
    * a reservoir, the winners are a pure function of the keys, so any
    * engine at any parallelism selects the same rows.
    *
    * Scale: one shuffle on the group column + a per-group sort; for heavy
    * groups the sort is the cost — route through `plans.TopKPerKey` (heap,
    * no sort) when k is small and groups are huge. */
  def stratifiedExactK(df: DataFrame, groupCol: String, key: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** [[stratifiedExactK]] routed through the custom
    * [[graft.plans.TopK]] physical operator: same winners (min-k by the
    * portable md5 draw), but a bounded HEAP per (group, partition) with a
    * candidates-only shuffle instead of a full per-group sort — the scale
    * path when groups are huge and k is small. Selection is a pure
    * function of the keys, so the two formulations are row-identical
    * (SkewSpec pins the differential). */
  def stratifiedExactKFast(df: DataFrame, groupCol: String, key: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val draw = df
      .withColumn("__draw", md5(key.cast("string")))
      .withColumn("__tie", key.cast("string"))
    graft.plans.TopK.perKey(draw, Seq(groupCol),
      Seq(col("__draw").asc, col("__tie").asc), k)
      .drop("__draw", "__tie")
  }
}
