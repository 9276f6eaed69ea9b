package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is a pure Column pipeline ending in one
  * hash-partitioned aggregation or equi-join on a hash/bucket key —
  * map-side-combinable, skew-resistant (hash keys are uniform by
  * construction), and broadcast-free. At 100 TB the dominant cost is the
  * single shuffle on the dedup key, which is the information-theoretic
  * minimum for global dedup.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on md5(text); keeps the smallest doc_id as the
    * canonical representative. One shuffle on a uniform 128-bit key. */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  /** Word n-grams of a token-array column, as an array of space-joined
    * strings (shared by dedup shingling and Features.nGrams). Inputs with
    * fewer than n tokens yield an empty array, matching the reference's
    * nGrams semantics (an unguarded descending `sequence` would make
    * `slice` throw at runtime). */
  def nGramsOfTokens(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(
        sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of a text column (default 3-gram), as an array. */
  def shingleArray(text: Column, n: Int = 3): Column =
    nGramsOfTokens(split(trim(text), "\\s+"), n)

  /** Exploded distinct (doc_id, shingle) pairs; inputs with fewer than n
    * tokens produce no shingles. */
  def shingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    Par.spread(docs).where(size(split(trim(col(textCol)), "\\s+")) >= n)
      .select(col("doc_id"), explode(array_distinct(shingleArray(col(textCol), n))).as("shingle"))

  /** [[shingles]] with the shingle collapsed to its xxhash64 token. For
    * consumers that only ever compare shingles for equality (intersection
    * joins, per-doc counts, contains-checks) the 8-byte token is
    * semantics-preserving up to a ~2⁻⁶⁴-per-pair collision, and it shrinks
    * the materialized relation and every downstream shuffle ~3-4× versus
    * carrying ~25-byte shingle strings — at corpus scale the shingle
    * relation IS the dominant shuffle, so this is the scale path. */
  def hashedShingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    shingles(docs, textCol, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))

  /** ONE tokenize+shingle pass producing BOTH near-dup proxies of a corpus
    * slice: the K-hash minhash signature array (`__sig` — element i+1 is
    * [[minhashSignatures]]' `mh_i`, bit-identical) and the per-doc DISTINCT
    * hashed shingles (`__sh` — `explode(__sh)` is row-identical to
    * [[hashedShingles]]: xxhash64 over the same distinct shingle strings).
    *
    * The near-dup pipeline used to run the tokenize+shingle map (split +
    * slice + concat per shingle — the dominant map-side cost at any corpus
    * scale) TWICE: once under the LSH signature, once under the verify
    * shingles. Fusing them halves that (r16, guide §1.2/§2.4: one pass for
    * two proxies of the same payload). Callers checkpoint this relation —
    * ~8 bytes per shingle plus the K×8-hex signature, no fatter than the
    * exploded shingle relation the split pipeline already materialized —
    * and derive band/shingle views from it via [[sigCols]]/[[shingleView]]. */
  private[graft] def sigAndShingles(docs: DataFrame, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame = {
    // __arr in its OWN projection, referenced twice above it: CollapseProject
    // keeps a non-cheap alias with multiple references in its own stage, so
    // the shingle array is computed once per row
    val base = Par.spread(docs)
      .where(size(split(trim(col(textCol)), "\\s+")) >= shingleN)
      .select(col("doc_id"), shingleArray(col(textCol), shingleN).as("__arr"))
    base.select(col("doc_id"),
      graft.functions.Native.minhashSig(col("__arr"), numHashes).as("__sig"),
      transform(array_distinct(col("__arr")), s => xxhash64(s)).as("__sh"))
  }

  /** mh0..mhK-1 view of a [[sigAndShingles]] relation — column-identical to
    * [[minhashSignatures]] output. */
  private[graft] def sigCols(fused: DataFrame, numHashes: Int): DataFrame =
    fused.select(col("doc_id") +:
      (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"mh$i")): _*)

  /** Exploded `(doc_id, shingle)` view of a [[sigAndShingles]] relation —
    * row-identical to [[hashedShingles]]. */
  private[graft] def shingleView(fused: DataFrame): DataFrame =
    fused.select(col("doc_id"), explode(col("__sh")).as("shingle"))

  /** Build BOTH persistent dedup artifacts — the banded LSH index
    * ([[lshBands]]) and the hashed-shingle store ([[hashedShingles]]) — in
    * ONE tokenize+shingle pass over the corpus instead of two full corpus
    * scans. The fused per-doc relation is checkpointed once; the returned
    * relations are cheap views over it (r16, guide §2.4). */
  def lshIndexAndShingleStore(docs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3)
      : (DataFrame, DataFrame) = {
    val fused = sigAndShingles(docs, textCol, bands * rowsPerBand, shingleN)
      .localCheckpoint()
    (bandRows(sigCols(fused, bands * rowsPerBand), bands, rowsPerBand),
      shingleView(fused))
  }

  /** MinHash signature: engine-portable, deterministic. Hash functions come
    * in groups of four per md5 — hash i is the 8-hex-char (32-bit) chunk
    * `i%4` of `md5(i/4 || '-' || shingle)` — so K hashes cost ceil(K/4) md5
    * evaluations per shingle instead of K (hashing dominates minhash cost at
    * corpus scale). Fixed-width lowercase hex compares like the 32-bit value.
    * Signature columns mh0..mhK.
    *
    * Runs on the fused native [[graft.functions.MinHashSig]] expression: the
    * whole signature is ONE narrow pass over each document's shingle array —
    * no explode, no shuffle — so at corpus scale this is a pure map stage.
    * [[minhashSignaturesViaAgg]] keeps the composed explode+groupBy
    * formulation as the differential reference. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
      numHashes: Int = 4, shingleN: Int = 3): DataFrame = {
    val base = Par.spread(docs)
      .where(size(split(trim(col(textCol)), "\\s+")) >= shingleN)
      // min is insensitive to duplicates — no array_distinct needed
      .select(col("doc_id"),
        graft.functions.Native.minhashSig(
          shingleArray(col(textCol), shingleN), numHashes).as("__sig"))
    base.select(col("doc_id") +:
      (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"mh$i")): _*)
  }

  /** Composed (built-ins-only) signature formulation — explode + groupBy with
    * K min(substring(md5)) aggregates. Bit-identical to [[minhashSignatures]]
    * (NativeSpec pins the differential); kept as the reference path. */
  def minhashSignaturesViaAgg(docs: DataFrame, textCol: String = "text",
      numHashes: Int = 4, shingleN: Int = 3): DataFrame = {
    val sh = Par.spread(docs).where(size(split(trim(col(textCol)), "\\s+")) >= shingleN)
      .select(col("doc_id"),
        explode(shingleArray(col(textCol), shingleN)).as("shingle"))
    val aggs = (0 until numHashes).map { i =>
      val base = md5(concat(lit((i / 4).toString), lit("-"), col("shingle")))
      min(substring(base, 1 + 8 * (i % 4), 8)).as(s"mh$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band the signature (here: one band = all K hashes
    * concatenated — at production scale use B bands of R rows each by calling
    * this with `bandCols` subsets) and self-join on the band key. The join is
    * an equi-join on a uniform hash key → sort-merge/hash join, no skew. */
  def lshCandidatePairs(signatures: DataFrame, bandCols: Seq[String]): DataFrame = {
    val band = signatures.select(
      col("doc_id"), sha2(concat_ws("|", bandCols.map(col): _*), 256).as("band"))
    val a = band.as("a")
    val b = band.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
  }

  /** Full banded MinHash LSH (shingle → minhash → band → bucket-join):
    * `bands` bands of `rowsPerBand` signature rows; a pair is a candidate if
    * ANY band matches (collision prob 1-(1-s^r)^b for Jaccard s). One long
    * relation (doc, band_id, band_key), one self-equi-join on the uniform
    * (band_id, band_key) key, distinct — scales as a plain hash join. */
  /** The banded-LSH index relation `(doc_id, band_id, band_key)` — the
    * PERSISTENT artifact of LSH dedup at corpus scale: write it once
    * (partitioned/bucketed by `(band_id, band_key)`), then both global
    * dedup (self-join) and incremental probes of new batches
    * ([[Curation.incrementalNearDups]]) are plain equi-joins against it,
    * never touching the corpus text again. */
  def lshBands(docs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame =
    bandRows(
      minhashSignatures(docs, textCol, bands * rowsPerBand, shingleN)
        .localCheckpoint(),
      bands, rowsPerBand)

  /** `(doc_id, band_id, band_key)` from a signature relation in ONE scan:
    * the band structs explode out of each signature row. The previous
    * union-of-selects re-read the signature relation once per band —
    * 2·bands block reads when self-joined — and carried a bands-way Union
    * through every downstream plan (the simhashProbes treatment; r16,
    * guide §2.4). Same rows, same schema, same types. */
  private[graft] def bandRows(sig: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => col(s"mh$i"))
          struct(lit(b).as("band_id"), concat_ws("|", cols: _*).as("band_key"))
        }: _*)).as("__band"))
      .select(col("doc_id"), col("__band.band_id").as("band_id"),
        col("__band.band_key").as("band_key"))

  /** LSH self-join with a HOT-BUCKET guard: a band bucket of n members
    * emits n(n-1)/2 pairs, so an adversarial corpus of N identical docs
    * turns one bucket quadratic (N=1M identical boilerplate pages → 5·10¹¹
    * pairs from a single key). Buckets larger than `maxBucket` therefore
    * fall back to a STAR: every member pairs with the bucket's min-doc_id
    * representative (linear in bucket size). Oversized buckets are
    * same-signature clusters in practice, and downstream consumers
    * (connected-components dup clusters, keep-lists) only need the
    * bucket's pair graph CONNECTED, not complete — below the cap nothing
    * changes (OpsSpec pins both properties). Audit the capped keys with
    * [[lshHotBuckets]]. */
  def minhashLSH(docs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    minhashLSHFromBands(
      lshBands(docs, textCol, bands, rowsPerBand, shingleN), maxBucket)

  /** The guarded LSH self-join of [[minhashLSH]] over an EXISTING band
    * relation `(doc_id, band_id, band_key)` — lets callers that already
    * materialized the bands (e.g. from a fused [[sigAndShingles]] pass)
    * skip the second signature build. */
  def minhashLSHFromBands(bandRows: DataFrame,
      maxBucket: Int = 10000): DataFrame = {
    // Bucket size and representative come from a WINDOW over the exact
    // partitioning the self-join needs anyway — the window's exchange IS
    // the join-side exchange (EnsureRequirements adds none on top), so the
    // guard costs one within-partition sort, not extra shuffle jobs.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_key")
    val tagged = bandRows
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rep", min("doc_id").over(w))
    val small = tagged.where(col("__n") <= maxBucket)
    val allPairs = small.as("a").join(small.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
    val starPairs = tagged.where(col("__n") > maxBucket && col("doc_id") > col("__rep"))
      .select(col("__rep").as("id1"), col("doc_id").as("id2"))
    allPairs.union(starPairs).distinct()
  }

  /** Band buckets whose size exceeds `maxBucket` — the keys [[minhashLSH]]
    * star-capped, for auditing/alerting on boilerplate floods. */
  def lshHotBuckets(docs: DataFrame, textCol: String = "text",
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    lshBands(docs, textCol, bands, rowsPerBand, shingleN)
      .groupBy("band_id", "band_key").agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket)

  /** Rounded Jaccard |A∩B| / (|A|+|B|-|A∩B|) from intersection and per-set
    * counts — ONE definition shared by every verification path (the oracle
    * SQL depends on bit-level agreement with this exact formula). */
  private def jaccardCol: Column =
    Portable.round(col("c").cast("double") /
      (col("c1.n") + col("c2.n") - col("c")).cast("double"), 6)

  /** Attach per-pair counts + jaccard to an intersection-count relation
    * (id1, id2, c) given per-doc shingle counts. */
  private def scorePairs(inter: DataFrame, cnt: DataFrame): DataFrame =
    inter
      .join(cnt.as("c1"), col("id1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("id2") === col("c2.doc_id"))
      .select(col("id1"), col("id2"), jaccardCol.as("jaccard"))

  /** Exact Jaccard for an explicit candidate-pair relation (id1, id2) — the
    * verification step after any candidate generator (LSH bands, id windows,
    * embedding buckets). */
  def verifyJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("id2") === col("s2.doc_id") &&
        col("s1.shingle") === col("s2.shingle"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("c"))
    scorePairs(inter, cnt)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs constrained by a
    * bounded doc_id window (`maxIdGap`) — the verification step after LSH.
    * |A∩B| via shingle equi-join, |A∪B| = |A|+|B|-|A∩B|. */
  def ngramJaccard(docs: DataFrame, textCol: String = "text", shingleN: Int = 3,
      maxIdGap: Long = 5): DataFrame = {
    // The shingle relation feeds three consumers (both join sides + the
    // per-doc counts); localCheckpoint materializes it once instead of
    // re-running tokenize+shingle 3x. Blocks are freed by the ContextCleaner
    // when the plan is GC'd. Hashed shingles: only equality survives the
    // pipeline (join + counts), so the 8-byte token cuts the checkpoint and
    // both join-side shuffles ~3-4×.
    val sh = hashedShingles(docs, textCol, shingleN).localCheckpoint()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Band ids into width-maxIdGap buckets and make the bucket part of the
    // join key: a hot shingle shared by k docs otherwise pairs k² rows before
    // the gap filter prunes them (join on shingle alone is quadratic in
    // shingle frequency). A pair with 0 < id2-id1 <= maxIdGap has id2's
    // bucket in {b1, b1+1}, so exploding s1 into those two buckets makes
    // each qualifying pair match exactly once — 2x row duplication buys
    // candidate sets bounded by bucket occupancy instead of corpus frequency.
    val s1 = sh.withColumn("__b", explode(array(
      expr(s"doc_id div $maxIdGap"), expr(s"doc_id div $maxIdGap + 1"))))
    val s2 = sh.withColumn("__b", expr(s"doc_id div $maxIdGap"))
    val inter = s1.as("s1").join(s2.as("s2"),
        col("s1.__b") === col("s2.__b") &&
        col("s1.shingle") === col("s2.shingle") &&
        col("s2.doc_id") > col("s1.doc_id") &&
        col("s2.doc_id") - col("s1.doc_id") <= maxIdGap)
      .groupBy(col("s1.doc_id").as("id1"), col("s2.doc_id").as("id2"))
      .agg(count(lit(1)).as("c"))
    scorePairs(inter, cnt)
  }

  /** 64-bit SimHash over whitespace tokens: per token take xxhash64(token);
    * for each bit position sum +1/-1 weighted by token frequency; simhash bit
    * = sign. Columnar (explode + 1 aggregation), no UDFs. */
  def simhash64(docs: DataFrame, textCol: String = "text"): DataFrame =
    simhashBits(docs, textCol, 64, tok => xxhash64(tok))

  /** Shared simhash core: per-token hash column -> per-bit ±1 sums -> sign
    * fingerprint. Both the fast (xxhash64) and portable (md5) variants ride
    * on this one implementation. */
  private def simhashBits(docs: DataFrame, textCol: String, bits: Int,
      tokenHash: Column => Column): DataFrame = {
    val tok = Par.spread(docs).select(col("doc_id"),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .select(col("doc_id"), tokenHash(col("tok")).as("h"))
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs: candidate generation by sign-bit
    * bucketing (only 1/2^bits of the corpus pairs up), exact verification by
    * the native fused cosine. At 100 TB the self-join is an equi-join on a
    * uniform bucket key; raise `bits` to shrink candidate sets. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double = 0.9, bits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = Par.spread(corpus).select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.signBucket(col(vecCol), bits).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        Portable.round(Similarity.cosine(col("a.v"), col("b.v")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Engine-portable SimHash over `bits` ≤ 16 bit positions: the per-token
    * hash is the first ceil(bits/4) hex chars of md5 (so any engine with md5
    * reproduces it bit-for-bit). [[simhash64]] (xxhash64) stays the fast
    * wide-fingerprint path; this is the cross-engine-verifiable variant. */
  def simhashPortable(docs: DataFrame, textCol: String = "text", bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 16)
    val hexChars = (bits + 3) / 4
    simhashBits(docs, textCol, bits,
      tok => conv(substring(md5(tok), 1, hexChars), 16, 10).cast("long"))
  }

  /** Corpus-wide hamming near-dup pairs over the 64-bit SimHash, via
    * multi-probe banded candidate generation — NO id-window bound: recall
    * is guaranteed for every pair with hamming ≤ `maxHamming` (see
    * [[simhashBandedPairs]]), so the result EQUALS the brute-force
    * all-pairs hamming filter while executing as plain equi-joins. */
  def simhashNearDups(docs: DataFrame, textCol: String = "text",
      maxHamming: Int = 8, blocksPerKey: Int = 1): DataFrame =
    simhashBandedPairs(simhash64(docs, textCol), 64, maxHamming, blocksPerKey)

  /** Engine-portable twin over the md5-derived [[simhashPortable]]
    * fingerprint — cross-engine verifiable bit-for-bit (gate q160). */
  def simhashNearDupsPortable(docs: DataFrame, textCol: String = "text",
      maxHamming: Int = 4, bits: Int = 16): DataFrame =
    simhashBandedPairs(simhashPortable(docs, textCol, bits), bits, maxHamming)

  /** Multi-probe banded hamming join over a signature relation
    * `(doc_id, simhash)`.
    *
    * The fingerprint is split into `maxHamming + blocksPerKey` contiguous
    * blocks; each probe key concatenates one size-`blocksPerKey` block
    * combination. A pair within hamming `t = maxHamming` has its differing
    * bits in at most `t` blocks, leaving ≥ `blocksPerKey` clean blocks, so
    * by pigeonhole SOME probe key matches exactly — guaranteed recall,
    * then exact `bit_count(xor)` verification filters false positives.
    * Every probe is a self-equi-join on a uniform short key: no cartesian,
    * no window bound, hash-partitionable at corpus scale.
    *
    * `blocksPerKey` trades probe count for key selectivity: the default 1
    * emits `t+1` rows per doc (same shape as MinHash LSH banding); at
    * billion-doc scale raise it so keys carry
    * `blocksPerKey · bits/(t+blocksPerKey)` bits and buckets stay small —
    * the block-combination scheme of Manku et al., "Detecting
    * Near-Duplicates for Web Crawling" (WWW'07). */
  def simhashBandedPairs(sig: DataFrame, bits: Int, maxHamming: Int,
      blocksPerKey: Int = 1): DataFrame = {
    // materialize the signature ONCE: the self-join reads `sig` from both
    // sides (two map stages), so an un-materialized fingerprint pipeline —
    // e.g. a multimodal decode — would re-execute per side (and per action
    // downstream). 16 bytes/row, MEMORY_AND_DISK; lineage also truncates,
    // keeping the join plan independent of however expensive the
    // fingerprint derivation was. (r15, guide §2.4: the decode is the
    // heavy proxy-producing pass — run it exactly once.)
    val probes = simhashProbes(sig.localCheckpoint(), bits, maxHamming,
      blocksPerKey)
    probes.as("a").join(probes.as("b"),
        col("a.probe_id") === col("b.probe_id") &&
        col("a.probe_key") === col("b.probe_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The multi-probe relation `(doc_id, simhash, probe_id, probe_key)` for
    * a signature relation — the PERSISTENT simhash index artifact: write
    * it once (bucketed by `(probe_id, probe_key)`), then global dedup
    * ([[simhashBandedPairs]] self-joins it) and incremental batch probes
    * ([[probeSimhashIndex]]) are plain equi-joins that never recompute
    * corpus fingerprints. Same role for the simhash family as
    * [[lshBands]] for MinHash LSH. */
  def simhashProbes(sig: DataFrame, bits: Int, maxHamming: Int,
      blocksPerKey: Int = 1): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0: $maxHamming")
    require(blocksPerKey >= 1, s"blocksPerKey must be >= 1: $blocksPerKey")
    val blocks = maxHamming + blocksPerKey
    require(blocks <= bits, s"more blocks than bits: $blocks > $bits")
    val base = bits / blocks; val rem = bits % blocks
    val widths = (0 until blocks).map(j => base + (if (j < rem) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1L
    // unsigned shift: block containing the sign bit must not sign-extend
    def blockVal(j: Int): Column =
      shiftrightunsigned(col("simhash"), offsets(j)).bitwiseAND(lit(mask(widths(j))))
    val combos = (0 until blocks).combinations(blocksPerKey).toSeq
    // ONE scan of `sig`, probes via explode — the previous union-of-selects
    // re-scanned the signature relation once per combo (×2 when self-joined:
    // 2·C(blocks,blocksPerKey) full passes over however expensive `sig` is
    // to produce). Same rows, same schema, same types (r15, guide §2.4).
    sig.select(col("doc_id"), col("simhash"),
        explode(array(combos.zipWithIndex.map { case (combo, ci) =>
          struct(lit(ci).as("probe_id"),
            concat_ws("|",
              combo.map(j => blockVal(j).cast("string")): _*).as("probe_key"))
        }: _*)).as("__probe"))
      .select(col("doc_id"), col("simhash"),
        col("__probe.probe_id").as("probe_id"),
        col("__probe.probe_key").as("probe_key"))
  }

  /** Incremental simhash dedup-on-ingest: probe a NEW batch's probe rows
    * against a persisted corpus index ([[simhashProbes]] output, both built
    * with the same bits/maxHamming/blocksPerKey) — one equi-join on
    * `(probe_id, probe_key)`, exact hamming verification, corpus text and
    * fingerprints never recomputed. Guaranteed recall for every new×corpus
    * pair within the hamming bound (same pigeonhole as the self-join
    * form). Output `(new_id, corpus_id, hamming)`. */
  def probeSimhashIndex(index: DataFrame, batchProbes: DataFrame,
      maxHamming: Int): DataFrame =
    batchProbes.as("b").join(index.as("a"),
        col("a.probe_id") === col("b.probe_id") &&
        col("a.probe_key") === col("b.probe_key"))
      .select(col("b.doc_id").as("new_id"), col("a.doc_id").as("corpus_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
}
