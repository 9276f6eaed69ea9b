package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus-wide set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin candidate-generation family (Bayardo et al., "Scaling Up
  * All Pairs Similarity Search", WWW'07; Xiao et al. PPJoin).
  *
  * Finds EVERY document pair whose n-gram-shingle Jaccard similarity is
  * `>= tNum/tDen` — no id windows, no probabilistic recall: the result is
  * provably identical to the brute-force all-pairs join.
  *
  * Why it scales where brute force cannot: order the corpus vocabulary
  * globally by document frequency (rarest first). If `Jaccard(x, y) >= t`
  * then `overlap >= t * |x|` (the union is at least `max(|x|,|y|)`), so any
  * qualifying pair must collide on at least one of the first
  * `|x| - ceil(t*|x|) + 1` tokens of each side in that global order — the
  * "prefix". Joining only prefix tokens (the globally RAREST tokens of each
  * document) shrinks the candidate join's key-frequency distribution by
  * construction: hot shingles ("the quick brown") are exactly the ones the
  * prefix excludes. A length filter (`t * max(|x|,|y|) <= min(|x|,|y|)`,
  * necessary for Jaccard >= t) prunes cross-size candidates inside the same
  * join. Verification then computes exact overlap for surviving candidates
  * only.
  *
  * Shuffle budget: one agg for document frequency, one window for per-doc
  * prefix ranks, one equi-join on prefix shingle, one verification join —
  * all hash-partitioned on uniform 8-byte hashed shingles or doc ids. No
  * cartesian stage anywhere; candidate volume is bounded by prefix-token
  * bucket occupancy, which rarest-first ordering minimizes (this is the
  * algorithm's own hot-key guard).
  *
  * Reference anchor: generalizes `ngramJaccard` (the bounded-id-window
  * variant kept for windowed dedup) to the corpus-wide operator; same
  * shingle relation, same verification semantics.
  */
object SetSim {

  /** All pairs `(id1 < id2)` with shingle-set Jaccard `>= tNum/tDen`.
    *
    * Output: `(id1, id2, overlap, n1, n2, jaccard)` where `overlap` is the
    * exact shingle intersection size, `n1`/`n2` the distinct-shingle set
    * sizes, and `jaccard` the similarity rounded to micros. The threshold
    * test is pure integer arithmetic (`overlap * tDen >= tNum * (n1+n2-overlap)`)
    * so the cut is engine-portable — no float boundary cases.
    */
  def jaccardSelfJoin(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, tNum: Long = 1, tDen: Long = 2): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    // Shingle relation feeds document frequency, per-doc counts, the prefix
    // join AND verification — materialize once (8-byte hashed shingles; only
    // equality survives downstream, per hashedShingles' contract).
    val sh = Dedup.hashedShingles(docs, textCol, shingleN).localCheckpoint()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cands = candidatePairs(sh, cnt, tNum, tDen)
    // Exact verification on candidates only; integer threshold cut.
    val inter = cands
      .join(sh.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("id2") === col("s2.doc_id") &&
        col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("overlap"))
    inter
      .join(cnt.as("c1"), col("id1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("id2") === col("c2.doc_id"))
      .where(col("overlap") * lit(tDen) >=
        lit(tNum) * (col("c1.n") + col("c2.n") - col("overlap")))
      .select(col("id1"), col("id2"), col("overlap"),
        col("c1.n").as("n1"), col("c2.n").as("n2"),
        Portable.round(col("overlap").cast("double") /
          (col("c1.n") + col("c2.n") - col("overlap")).cast("double"), 6).as("jaccard"))
  }

  /** Candidate generation only (exposed for pruning tests): pairs that
    * collide on a PREFIX shingle and pass the length + POSITION filters.
    * Complete for Jaccard >= tNum/tDen by the prefix-filter bound.
    *
    * Position filter (PPJoin, Xiao et al.): a pair colliding at prefix
    * ranks (i, j) can share at most `1 + min(n1-i, n2-j)` tokens (nothing
    * before the collision token in the global order is shared at a first
    * collision, and at the FIRST collision the bound holds exactly) — while
    * Jaccard >= t forces overlap >= ceil(tNum*(n1+n2) / (tNum+tDen))
    * (from o >= t/(1+t)·(n1+n2)). Joining only where the bound can reach
    * the requirement prunes same-length pairs whose rare tails merely graze
    * each other — on top of, and independent from, the length filter. */
  private[ops] def candidatePairs(sh: DataFrame, cnt: DataFrame,
      tNum: Long, tDen: Long): DataFrame = {
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // Global rarest-first total order: (df asc, shingle asc). Prefix length
    // p = n - ceil(t*n) + 1 with ceil in exact integer arithmetic.
    val prefix = sh.join(df, "shingle").join(cnt, "doc_id")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .where(col("__rk") <= col("n") - expr(s"(n * $tNum + $tDen - 1) div $tDen") + lit(1))
      .select(col("doc_id"), col("shingle"), col("n"), col("__rk"))
    // required overlap alpha = ceil(tNum*(n1+n2) / (tNum+tDen)); the double
    // divide + truncating cast is exact integer floor here (operands far
    // below 2^53)
    val alpha = ((lit(tNum) * (col("a.n") + col("b.n")) + lit(tNum + tDen) - lit(1L)) /
      lit(tNum + tDen)).cast("long")
    prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("b.doc_id") > col("a.doc_id") &&
        greatest(col("a.n"), col("b.n")) * lit(tNum) <=
          least(col("a.n"), col("b.n")) * lit(tDen) &&
        lit(1L) + least(col("a.n") - col("a.__rk"), col("b.n") - col("b.__rk")) >= alpha)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }
}
