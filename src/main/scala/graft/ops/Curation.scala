package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data curation pipelines — the end-to-end shapes a
  * 100 TB corpus pass actually runs, built from the individual operators.
  */
object Curation {

  /** Full near-duplicate pipeline: banded MinHash LSH candidates → exact
    * n-gram Jaccard verification on ONLY the candidate pairs → threshold.
    * At corpus scale the expensive exact step touches candidate pairs
    * (≈ linear) instead of the quadratic pair space. */
  def nearDuplicates(docs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // ONE tokenize+shingle pass feeds BOTH stages (it used to run twice:
    // once under the LSH signature, once under the verify shingles — at
    // corpus scale that doubled the dominant map cost; r16, guide
    // §1.2/§2.4). The fused checkpoint carries the signature AND the
    // per-doc hashed shingle array (8 bytes/shingle — same bytes the old
    // exploded-shingle checkpoint held); candidate bands and the verify
    // relation are cheap views over it.
    val k = bands * rowsPerBand
    val fused = Dedup.sigAndShingles(docs, textCol, k, shingleN)
      .localCheckpoint()
    val cands = Dedup.minhashLSHFromBands(
      Dedup.bandRows(Dedup.sigCols(fused, k), bands, rowsPerBand))
    Dedup.verifyJaccard(Dedup.shingleView(fused), cands)
      .where(col("jaccard") >= minJaccard)
  }

  /** Duplicate clusters: near-duplicate pairs form a graph whose connected
    * components are the duplicate groups; every member maps to the group's
    * minimum doc_id (the canonical representative to keep).
    *
    * Uses min-label propagation, not the alternating-star variant: similarity
    * graphs are near-cliques with O(1) diameter by construction, so min-label
    * converges in ~diameter rounds of TWO shuffles each, while alternating-star
    * pays 4-5 shuffles per round to win only when components are long chains
    * (which duplicate clusters never are). */
  def duplicateClusters(docs: DataFrame, textCol: String = "text",
      minJaccard: Double = 0.5): DataFrame = {
    // materialize the (expensive) near-dup pipeline ONCE before the iterative
    // components pass — otherwise every fixpoint round would re-run the full
    // LSH + jaccard DAG (the reference's auto-cache rule, applied by hand)
    val pairs = nearDuplicates(docs, textCol, minJaccard = minJaccard)
      .select(col("id1").as("src"), col("id2").as("dst"))
      .localCheckpoint()
    graft.lib.Graphs.connectedComponents(pairs, docs.sparkSession)
      .select(col("vertex").as("doc_id"), col("label").as("canonical_id"))
  }

  /** Near-dup-aware train/val/test split: split membership is drawn on
    * each document's duplicate-cluster CANONICAL id (singletons are their
    * own canonical), so near-duplicate documents can never straddle a
    * split boundary — the train/test leakage hole a row-keyed
    * [[Sampling.hashSplit]] leaves open when the corpus carries
    * near-copies. Same engine-portable md5 thresholds; one extra join
    * against the (clustered-docs-only) canonical relation. */
  def dedupAwareSplit(docs: DataFrame, textCol: String = "text",
      splits: Seq[(String, Double)], minJaccard: Double = 0.5): DataFrame = {
    // alias the cluster relation to reserved __-names BEFORE the join, so
    // an input that already carries a `canonical_id` column cannot make
    // the coalesce reference ambiguous (the __rep convention)
    val clusters = duplicateClusters(docs, textCol, minJaccard)
      .select(col("doc_id").as("__cid"), col("canonical_id").as("__canon"))
    val withRep = docs.join(clusters, col("doc_id") === col("__cid"), "left")
      .withColumn("__rep", coalesce(col("__canon"), col("doc_id")))
    Sampling.hashSplit(withRep, col("__rep"), splits)
      .drop("__cid", "__canon", "__rep")
  }

  /** Incremental near-duplicate check: probe a NEW batch of documents
    * against an EXISTING corpus through its persisted LSH index
    * ([[Dedup.lshBands]]) instead of re-running global dedup.
    *
    * Returns `(new_id, corpus_id, jaccard)` for every (new, corpus) pair
    * with Jaccard ≥ `minJaccard`. In-batch duplicates are out of scope —
    * run [[nearDuplicates]] on the batch for those.
    *
    * Scale shape — the whole point of the op: the corpus text is touched
    * ONLY for docs whose band bucket the new batch hits. Candidate
    * generation is an equi-join of the (tiny) new-batch band rows against
    * the index on the uniform `(band_id, band_key)` key; the corpus side
    * is then narrowed by a semi-join to matched ids before shingling, so
    * verification cost is O(|new| + matched docs), independent of corpus
    * size. With the index stored bucketed by band key, the probe join is
    * shuffle-free on the corpus side. */
  def incrementalNearDups(corpus: DataFrame, corpusIndex: DataFrame,
      newDocs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // the batch is tokenized ONCE (fused signature + shingles; r16) — it
    // used to be shingled a second time for verification
    val fused = Dedup.sigAndShingles(newDocs, textCol,
      bands * rowsPerBand, shingleN).localCheckpoint()
    val probe = Dedup.bandRows(
      Dedup.sigCols(fused, bands * rowsPerBand), bands, rowsPerBand)
    val cands = probe.as("p")
      .join(corpusIndex.as("i"),
        col("p.band_id") === col("i.band_id") &&
          col("p.band_key") === col("i.band_key"))
      .select(col("p.doc_id").as("id1"), col("i.doc_id").as("id2"))
      .distinct()
      .localCheckpoint() // bound: reused by the semi-join AND verification
    val touched = corpus.join(
      cands.select(col("id2").as("doc_id")).distinct(), Seq("doc_id"), "semi")
    val sh = Dedup.shingleView(fused)
      .unionByName(Dedup.hashedShingles(touched, textCol, shingleN))
      .localCheckpoint()
    Dedup.verifyJaccard(sh, cands).where(col("jaccard") >= minJaccard)
      .select(col("id1").as("new_id"), col("id2").as("corpus_id"), col("jaccard"))
  }

  /** [[incrementalNearDups]] against the PERSISTED artifacts only: the
    * corpus never appears — candidates come from the band index and
    * verification reads the hashed-shingle store (both maintained by
    * [[extendIndex]]). This is the production ingest loop's probe: at
    * 100 TB neither the corpus text nor un-hit shingles are touched. */
  def probeIndexed(index: DataFrame, shingleStore: DataFrame,
      newDocs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // one fused tokenize pass over the batch (r16) — bands for the probe
    // join, hashed shingles for verification, from the same checkpoint
    val fused = Dedup.sigAndShingles(newDocs, textCol,
      bands * rowsPerBand, shingleN).localCheckpoint()
    val probe = Dedup.bandRows(
      Dedup.sigCols(fused, bands * rowsPerBand), bands, rowsPerBand)
    val cands = probe.as("p")
      .join(index.as("i"),
        col("p.band_id") === col("i.band_id") &&
          col("p.band_key") === col("i.band_key"))
      .select(col("p.doc_id").as("id1"), col("i.doc_id").as("id2"))
      .distinct()
      .localCheckpoint()
    val touched = shingleStore.join(
      cands.select(col("id2").as("doc_id")).distinct(), Seq("doc_id"), "semi")
    val sh = Dedup.shingleView(fused)
      .unionByName(touched).localCheckpoint()
    Dedup.verifyJaccard(sh, cands).where(col("jaccard") >= minJaccard)
      .select(col("id1").as("new_id"), col("id2").as("corpus_id"), col("jaccard"))
  }

  /** Advance the persisted dedup index by one ingested batch: the batch's
    * band rows are appended to the LSH index and its hashed shingles to the
    * shingle store. Pure unions — the index is append-only, so maintaining
    * it costs exactly the signatures of the NEW docs (in production each
    * append is a partition-aligned write into the bucketed index table).
    * Returns (extended index, extended shingle store). */
  def extendIndex(index: DataFrame, shingleStore: DataFrame,
      newDocs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3)
      : (DataFrame, DataFrame) = {
    // one fused tokenize pass over the batch (r16) — the band and shingle
    // appends derive from the same checkpointed per-doc relation
    val (bandsNew, shNew) = Dedup.lshIndexAndShingleStore(
      newDocs, textCol, bands, rowsPerBand, shingleN)
    (index.unionByName(bandsNew), shingleStore.unionByName(shNew))
  }

  /** One INGEST STEP — [[probeIndexed]] + [[extendIndex]] fused so the
    * batch's fused tokenize pass ([[Dedup.sigAndShingles]]: minhash
    * signature + hashed shingles, checkpointed once) runs exactly once:
    * calling the two separately runs it twice — once for the probe, once
    * for the index extension. The band rows and hashed shingles are shared
    * as the SAME DataFrame objects, NOT re-materialized: both are cheap
    * narrow views over the fused checkpoint, and an extra localCheckpoint
    * on them costs more than it saves (measured: ProfileIngest13). At
    * corpus scale the tokenize pass IS the per-batch ingest cost, so
    * sharing it halves that. Returns (near-dup pairs of the batch vs the
    * indexed corpus, extended index, extended shingle store). Pair
    * semantics identical to [[probeIndexed]]. */
  def ingestBatch(index: DataFrame, shingleStore: DataFrame,
      newDocs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      minJaccard: Double = 0.5): (DataFrame, DataFrame, DataFrame) = {
    // r16: the probe's bands and the batch's shingles now come from ONE
    // fused tokenize pass (they shared the signature since r13 but still
    // shingled the batch twice — once in lshBands' signature, once in
    // hashedShingles)
    val (probe, newSh) = Dedup.lshIndexAndShingleStore(
      newDocs, textCol, bands, rowsPerBand, shingleN)
    val cands = probe.as("p")
      .join(index.as("i"),
        col("p.band_id") === col("i.band_id") &&
          col("p.band_key") === col("i.band_key"))
      .select(col("p.doc_id").as("id1"), col("i.doc_id").as("id2"))
      .distinct()
      .localCheckpoint() // semi-join AND verification reuse
    val touched = shingleStore.join(
      cands.select(col("id2").as("doc_id")).distinct(), Seq("doc_id"), "semi")
    val sh = newSh.unionByName(touched).localCheckpoint() // 3 verify reads
    val pairs = Dedup.verifyJaccard(sh, cands).where(col("jaccard") >= minJaccard)
      .select(col("id1").as("new_id"), col("id2").as("corpus_id"), col("jaccard"))
    (pairs, index.unionByName(probe), shingleStore.unionByName(newSh))
  }

  /** Keep-list for a pretraining corpus: language + quality thresholds +
    * exact-dedup canonical representative. One pass for signals, one
    * aggregation for dedup, one join — returns the surviving doc_ids with
    * their signals. */
  def keepList(docs: DataFrame, textCol: String = "text",
      lang: String = "en", minTokens: Long = 5, maxTokens: Long = 100000,
      minAlpha: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.qualitySignals(
      docs.where(length(col(textCol)) > 0), textCol)
    val langs = TextAnalysis.languageId(docs, textCol)
    val canonical = Dedup.exactGroups(docs, textCol)
      .select(col("keep_id").as("doc_id"))
    docs.select("doc_id")
      .join(canonical, "doc_id") // exact-dup survivors only
      .join(quality, "doc_id")
      .join(langs, "doc_id")
      .where(col("pred_lang") === lang &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("alpha_ratio") >= minAlpha)
      .select(col("doc_id"), col("n_tokens"), col("alpha_ratio"), col("pred_lang"))
  }

  /** Per-group percentile cut for a curation signal: keep rows whose
    * `valCol` does not exceed the group's `frac`-percentile (e.g. drop the
    * longest 5% of documents per source — outlier-length docs are usually
    * boilerplate/concatenation artifacts).
    *
    * DISCRETE percentile via `cume_dist` (share of rows ≤ this value), not
    * interpolated: the threshold is an actual data value and every
    * comparison is on input-typed values plus one IEEE division — portable
    * across engines, where interpolated percentiles differ in the last ulp
    * depending on the engine's lerp formula.
    *
    * One window + one tiny aggregate + one broadcast-sized join per group.
    */
  def percentileCut(df: DataFrame, groupCol: String, valCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    val wd = Window.partitionBy(groupCol).orderBy(valCol)
    val cuts = df.withColumn("__cd", cume_dist().over(wd))
      .where(col("__cd") >= frac)
      .groupBy(groupCol).agg(min(col(valCol)).as("cut"))
    df.join(broadcast(cuts), groupCol).where(col(valCol) <= col("cut"))
  }

  /** Benchmark-contamination check (decontamination pass): for every corpus
    * document, the fraction of its word n-gram shingles that appear anywhere
    * in the evaluation set. Documents scoring above a threshold are training
    * data that would leak the benchmark.
    *
    * The eval shingle set is distinct'd and BROADCAST — benchmarks are tiny
    * next to a 100 TB corpus, so the hit-count join runs map-side with no
    * shuffle of the corpus shingles; the only wide operations are the per-doc
    * counts, keyed by doc_id (uniform). */
  def contamination(docs: DataFrame, evalDocs: DataFrame,
      textCol: String = "text", shingleN: Int = 3): DataFrame = {
    // hashed shingles on BOTH sides: membership is an equality check, and the
    // broadcast eval set shrinks to 8 bytes/shingle (more benchmarks fit
    // under the broadcast threshold before falling back to a shuffle join)
    val sh = Dedup.hashedShingles(docs, textCol, shingleN).localCheckpoint()
    val evalSh = Dedup.hashedShingles(evalDocs, textCol, shingleN)
      .select("shingle").distinct()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hit = sh.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    docs.select("doc_id")
      .join(cnt, Seq("doc_id"), "left").join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(
          Portable.round(
            col("n_hit").cast("double") / col("n_shingles").cast("double"), 4),
          lit(0.0)).as("contam_frac"))
  }

  /** Corpus snapshot diff — the incremental-processing primitive: which
    * documents were `added`, `removed`, or `changed` between two corpus
    * versions (unchanged docs are omitted). Built for 100 TB × 100 TB:
    * each side reduces to `(id, md5(text))` AT THE SCAN, so the full-outer
    * join shuffles ~50 bytes per document, never the text; downstream
    * passes then touch only the delta (see the incremental signal
    * maintenance gate, which feeds this into [[StateStore]]). */
  def corpusDiff(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // coalesce BEFORE hashing: md5(null) is null, which the when-chain
    // below would read as "row absent" — a null-text doc must still count
    // as present (and differ from an empty-text doc only if texts differ)
    val o = oldV.select(col(idCol), md5(coalesce(col(textCol), lit(""))).as("__oh"))
    val n = newV.select(col(idCol), md5(coalesce(col(textCol), lit(""))).as("__nh"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed").as("change"))
      .where(col("change").isNotNull)
  }

  /** Multi-benchmark decontamination in ONE corpus pass — the production
    * form of [[contamination]]: a real pre-training run screens against
    * DOZENS of eval sets at once, and re-scanning 100 TB per benchmark is
    * the cost that matters. All benchmarks' distinct shingles are tagged
    * with their benchmark name, unioned (still droplet-sized — eval sets
    * are tiny), and BROADCAST, so the corpus shingle stream is computed
    * once and joined map-side against every benchmark simultaneously; the
    * only wide operations are the per-(doc, benchmark) hit counts, keyed
    * uniformly. Output is the LONG contamination report — one row per
    * (doc, benchmark) pair with at least one shared shingle:
    * `(doc_id, benchmark, n_hit, n_shingles, contam_frac)` — so 100 TB in
    * yields only the offender rows out, ready for a per-benchmark
    * threshold cut or a `keepList`-style anti-join. */
  def contaminationMatrix(docs: DataFrame, evals: Seq[(String, DataFrame)],
      textCol: String = "text", shingleN: Int = 3): DataFrame = {
    require(evals.nonEmpty, "need at least one eval set")
    require(evals.map(_._1).distinct.size == evals.size,
      "benchmark names must be distinct")
    val sh = Dedup.hashedShingles(docs, textCol, shingleN).localCheckpoint()
    val evalSh = evals.map { case (name, ev) =>
      Dedup.hashedShingles(ev, textCol, shingleN)
        .select(lit(name).as("benchmark"), col("shingle")).distinct()
    }.reduce(_.unionByName(_))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    sh.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id", "benchmark").agg(count(lit(1)).as("n_hit"))
      .join(cnt, "doc_id")
      .select(col("doc_id"), col("benchmark"), col("n_hit"), col("n_shingles"),
        Portable.round(
          col("n_hit").cast("double") / col("n_shingles").cast("double"), 4)
          .as("contam_frac"))
  }
}
