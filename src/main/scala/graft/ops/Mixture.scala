package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-budget allocation across corpus domains — the mixture solver a
  * multi-source training run needs: "give each domain its target share of a
  * B-token budget, but never repeat any domain more than `maxEpochs` times".
  *
  * That is water-filling: allocate proportionally to the target weights,
  * cap over-subscribed domains at `maxEpochs × available`, and redistribute
  * the surplus over the remaining weights — recursively, because the
  * redistribution can push further domains over their caps.
  *
  * The fixpoint has a closed form. Sort domains by `available/weight`
  * ascending (the order in which rising water reaches each cap). The capped
  * set is then a PREFIX of that order, and a domain `j` is in it iff
  *
  *   w_j · (B − Σ_{i<j} cap_i)  ≥  cap_j · Σ_{i≥j} w_i
  *
  * holds for `j` and every row before it (a running AND — prefix sums, one
  * window pass, no iteration). Everything is integer math in micro-units
  * (micro-epochs, micro-weights, micro-tokens), so an ANSI oracle reproduces
  * every allocation bit-for-bit with 128-bit integer window sums.
  *
  * Scale: the distributed work is ONE map-side-combinable aggregate over the
  * corpus (domain → token count, K rows out); the K-row water-filling itself
  * is exact `BigInt` arithmetic on the driver — the kMeans-centroid pattern:
  * collecting K domain totals is driver-scale by construction, and 100 TB of
  * corpus contributes exactly K longs to it.
  */
object Mixture {

  /** One domain's slice of the budget. `epochsMicros` = micro-epochs the
    * allocation implies (floor(alloc_μtok / n_tokens); 1 000 000 = one full
    * pass over the domain). */
  final case class DomainAlloc(domain: String, n_tokens: Long, capped: Boolean,
      alloc_tokens: Long, epochs_micros: Long)

  private val Micro = BigInt(1000000)

  /** Exact K-row water-filling (pure; unit-testable against the iterative
    * definition). Domains absent from `weights` — and weighted domains with
    * no tokens — take no part. All arithmetic is BigInt; ordering is the
    * IEEE-exact double `n/w` (both operands < 2^53 — corpus token counts and
    * micro-weights — so every engine derives the identical sort key),
    * tie-broken by domain name. */
  def allocate(counts: Seq[(String, Long)], weights: Map[String, Double],
      budgetTokens: Long, maxEpochs: Double): Seq[DomainAlloc] = {
    require(budgetTokens >= 0, s"budget must be non-negative: $budgetTokens")
    require(maxEpochs > 0.0 && maxEpochs <= 1024.0,
      s"maxEpochs must be in (0, 1024]: $maxEpochs")
    val eMicro = BigInt(math.floor(maxEpochs * 1e6 + 0.5).toLong)
    val wMicro: Map[String, Long] = weights.map { case (d, w) =>
      val micro = math.floor(w * 1e6 + 0.5).toLong
      // a weight that rounds to zero micro-units would make the capping
      // condition vacuous (0 ≥ cap·0) and hand the domain its full cap
      // regardless of budget — reject instead of silently over-allocating
      require(micro > 0L, s"weight for $d must be >= 5e-7: $w")
      d -> micro
    }
    val joined = counts.filter { case (d, n) => wMicro.contains(d) && n > 0 }
    require(joined.map(_._1).distinct.size == joined.size,
      "duplicate domain in counts")
    val ordered = joined.sortBy { case (d, n) =>
      (n.toDouble / wMicro(d).toDouble, d)
    }
    val bMu = BigInt(budgetTokens) * Micro
    var wge = ordered.map(x => BigInt(wMicro(x._1))).sum
    var cprev = BigInt(0)
    var running = true
    val flags = ordered.map { case (d, n) =>
      val w = BigInt(wMicro(d))
      val cap = BigInt(n) * eMicro
      val cond = running && w * (bMu - cprev) >= cap * wge
      running = cond
      cprev += cap // unconditional prefix — the oracle's window does the same
      wge -= w
      cond
    }
    val rows = ordered.zip(flags)
    val cS = rows.collect { case ((_, n), true) => BigInt(n) * eMicro }.sum
    val wR = rows.collect { case ((d, _), false) => BigInt(wMicro(d)) }.sum
    val rem = bMu - cS // ≥ 0: each capped row's condition implies cap fits
    rows.map { case ((d, n), isCapped) =>
      val allocMu =
        if (isCapped) BigInt(n) * eMicro
        else if (wR == 0) BigInt(0)
        else BigInt(wMicro(d)) * rem / wR
      DomainAlloc(d, n, isCapped, (allocMu / Micro).toLong,
        (allocMu / BigInt(n)).toLong)
    }
  }

  /** Per-domain token counts: one map-side-combinable aggregate, K rows. */
  def domainTokenCounts(df: DataFrame, domainCol: String,
      tokens: Column): DataFrame =
    df.groupBy(col(domainCol).as("domain"))
      .agg(sum(tokens.cast("long")).as("n_tokens"))

  /** End-to-end: count → collect K rows → exact water-fill → K-row report.
    * The only distributed pass is the count aggregate. */
  def tokenBudgetAllocation(df: DataFrame, domainCol: String, tokens: Column,
      weights: Map[String, Double], budgetTokens: Long,
      maxEpochs: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = domainTokenCounts(df, domainCol, tokens)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    allocate(counts, weights, budgetTokens, maxEpochs)
      .toDF("domain", "n_tokens", "capped", "alloc_tokens", "epochs_micros")
  }

  /** Materialize an allocation: each row of `df` is emitted once per whole
    * epoch its domain was allocated (`epoch` 0..⌊e⌋−1), plus once more in the
    * final partial epoch iff its seeded md5 draw clears the fractional
    * threshold — [[Sampling.upsampleDeterministic]] with a per-domain factor.
    * E[tokens out] = the domain's allocation; membership is a pure function
    * of (seed, key, allocation), so any engine at any parallelism
    * materializes the identical mixture. The explode is NARROW (no shuffle);
    * the per-domain factors ride in on a broadcast of K rows.
    *
    * The fractional threshold is derived in exact integer arithmetic:
    * `thr = (epochs_micros mod 1e6) · 2^32 div 1e6` (max ~4.3e15, well inside
    * a long), rendered as 8 lowercase hex chars — the same comparison every
    * other portable sampler here uses. */
  /** NOTE on coverage: the factor join is INNER, so rows whose domain has
    * no entry in `allocs` are DROPPED — i.e. an absent domain means
    * "allocate zero epochs", exactly like an explicit
    * `DomainAlloc(d, 0L)`. Callers that want unlisted domains preserved
    * must add them to `allocs` (e.g. at 1.0 epochs) explicitly. */
  def applyAllocation(df: DataFrame, domainCol: String, key: Column,
      allocs: Seq[DomainAlloc], seed: Long): DataFrame = {
    require(allocs.nonEmpty, "allocs must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val factors = allocs.map { a =>
      val whole = a.epochs_micros / 1000000L
      val fracMicro = a.epochs_micros % 1000000L
      val thr = f"${fracMicro * 4294967296L / 1000000L}%08x"
      (a.domain, whole, thr)
    }.toDF("__domain", "__whole", "__thr")
    Sampling.epochExplode(
        df.join(broadcast(factors), col(domainCol) === col("__domain")),
        col("__whole"), col("__thr"), Sampling.seededDraw(key, seed))
      .drop("__domain", "__whole", "__thr")
  }
}
