package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (test-scope main): replicate the documents table N× with
  * shifted doc_ids and time the dedup/frequency pipelines at 1× vs N×.
  * A healthy operator scales ~linearly in input volume here; anything
  * super-linear (a join exploding in a hot bucket, a sketch that stopped
  * pruning) shows up as a ratio well above N. Usage:
  *   sbt "Test/runMain graft.ProfileScale [sfDir] [N]"
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("profile-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val maxId = docs1.agg(max("doc_id")).head().getLong(0) + 1
    val docsN = (0 until n).map(i => docs1.select(
        (col("doc_id") + lit(i * maxId)).as("doc_id"), col("text")))
      .reduce(_ union _).repartition(32).localCheckpoint()

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $secs%7.2f s   rows=$rows")
      secs
    }

    println(s"== ${docs1.count()} docs at 1x, ${docsN.count()} at ${n}x ==")
    val j1 = time("jaccard 1x")(ops.Dedup.ngramJaccard(docs1, maxIdGap = 5).count())
    val jN = time(s"jaccard ${n}x")(ops.Dedup.ngramJaccard(docsN, maxIdGap = 5).count())
    val h1 = time("heavy-hitters 1x")(ops.HeavyHitters.exactOverThreshold(
      docs1.select(explode(split(trim(col("text")), "\\s+")).as("tok")), "tok", 100L).count())
    val hN = time(s"heavy-hitters ${n}x")(ops.HeavyHitters.exactOverThreshold(
      docsN.select(explode(split(trim(col("text")), "\\s+")).as("tok")), "tok", 100L).count())
    val l1 = time("lsh candidates 1x")(ops.Dedup.minhashLSH(docs1).count())
    val lN = time(s"lsh candidates ${n}x")(ops.Dedup.minhashLSH(docsN).count())
    println(f"ratios at ${n}x: jaccard=${jN / j1}%.1f heavy=${hN / h1}%.1f lsh=${lN / l1}%.1f (linear would be <= $n)")

    // similarity-search pillar: fixed query set, corpus replicated Nx
    val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val maxVec = emb1.agg(max("vec_id")).head().getLong(0) + 1
    val embN = (0 until n).map(i => emb1.select(
        (col("vec_id") + lit(i * maxVec)).as("vec_id"), col("embedding")))
      .reduce(_ union _).repartition(32).localCheckpoint()
    val qs = emb1.where(col("vec_id") < 8)
    val b1 = time("brute topk 1x")(ops.Similarity.cosineTopK(emb1, qs, k = 3).count())
    val bN = time(s"brute topk ${n}x")(ops.Similarity.cosineTopK(embN, qs, k = 3).count())
    val v1 = time("ivf topk 1x")(
      ops.Similarity.ivfTopK(emb1, qs, k = 3, nlist = 8, nprobe = 2, maxIter = 4).count())
    val vN = time(s"ivf topk ${n}x")(
      ops.Similarity.ivfTopK(embN, qs, k = 3, nlist = 8, nprobe = 2, maxIter = 4).count())
    println(f"ann ratios at ${n}x: brute=${bN / b1}%.1f ivf=${vN / v1}%.1f (linear would be <= $n)")

    // round-5 text ops: LM scoring (2 count shuffles + bigram join) and
    // chunking (narrow explode) under corpus replication
    val lm1 = time("bigram-lm 1x")(ops.TextAnalysis.bigramLogProb(docs1).count())
    val lmN = time(s"bigram-lm ${n}x")(ops.TextAnalysis.bigramLogProb(docsN).count())
    val c1 = time("chunking 1x")(
      ops.Packing.chunkByTokens(docs1, chunkTokens = 64, overlap = 16).count())
    val cN = time(s"chunking ${n}x")(
      ops.Packing.chunkByTokens(docsN, chunkTokens = 64, overlap = 16).count())
    println(f"text ratios at ${n}x: lm=${lmN / lm1}%.1f chunk=${cN / c1}%.1f (linear would be <= $n)")

    // round-5 additions: token entropy + cross-doc dup-ngram fraction
    // (both aggregation-shaped) and the incremental LSH probe — the probe's
    // BATCH is fixed while the corpus/index replicates Nx, so its wall time
    // should stay near-FLAT (the whole point of probing an index instead of
    // re-running global dedup)
    val e1 = time("entropy 1x")(ops.TextAnalysis.tokenEntropy(docs1).count())
    val eN = time(s"entropy ${n}x")(ops.TextAnalysis.tokenEntropy(docsN).count())
    val g1 = time("dup-ngrams 1x")(ops.TextAnalysis.dupNgramFraction(docs1).count())
    val gN = time(s"dup-ngrams ${n}x")(ops.TextAnalysis.dupNgramFraction(docsN).count())
    val batch = docs1.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + lit(n * maxId)).as("doc_id"), col("text"))
      .localCheckpoint()
    val idx1 = ops.Dedup.lshBands(docs1).localCheckpoint()
    val idxN = ops.Dedup.lshBands(docsN).localCheckpoint()
    val p1 = time("incr probe 1x corpus")(
      ops.Curation.incrementalNearDups(docs1, idx1, batch, minJaccard = 0.2).count())
    val pN = time(s"incr probe ${n}x corpus")(
      ops.Curation.incrementalNearDups(docsN, idxN, batch, minJaccard = 0.2).count())
    println(f"round-5b ratios at ${n}x: entropy=${eN / e1}%.1f dupgrams=${gN / g1}%.1f " +
      f"incr-probe=${pN / p1}%.1f (probe should be ~flat; linear would be <= $n)")

    // BPE training: replicated docs do NOT grow the distinct-word relation,
    // so per-round cost (and the learned merges) should be ~identical —
    // the "train on the word histogram" reduction, observed
    val bp1 = time("bpe train 1x")(ops.Bpe.train(docs1, numMerges = 10)._1.count())
    val bpN = time(s"bpe train ${n}x")(ops.Bpe.train(docsN, numMerges = 10)._1.count())
    println(f"bpe ratio at ${n}x: ${bpN / bp1}%.1f (should be ~flat: same word histogram)")

    // round-6 additions: the single-pass encoder (narrow map — linear),
    // corpus-wide banded simhash (equi-join on block keys — near-linear in
    // candidates), and the auto-guarded LSH already probed above
    val mergeList = {
      val (m, _) = ops.Bpe.trainLocal(docs1, numMerges = 60)
      m.orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    }
    val f1 = time("bpe encodeFast 1x")(ops.Bpe.encodeFast(docs1, mergeList).count())
    val fN = time(s"bpe encodeFast ${n}x")(ops.Bpe.encodeFast(docsN, mergeList).count())
    val s1 = time("simhash banded 1x")(ops.Dedup.simhashNearDups(docs1, maxHamming = 3).count())
    val sN = time(s"simhash banded ${n}x")(ops.Dedup.simhashNearDups(docsN, maxHamming = 3).count())
    println(f"round-6 ratios at ${n}x: encodeFast=${fN / f1}%.1f " +
      f"simhash-banded=${sN / s1}%.1f (encode linear; banded grows with true near-dup pairs)")

    // round-6c: prefix-filtered set-similarity (equi-join on rarest prefix
    // shingles — replication multiplies TRUE dup pairs ~N² per group, so
    // judge the ratio against output rows, not input rows), BM25 with a
    // fixed query batch over an Nx corpus (inverted-index join — linear),
    // and the PCA Gram aggregation (one treeAggregate — linear, flat).
    val ss1 = time("setsim 1x")(ops.SetSim.jaccardSelfJoin(docs1).count())
    val ssN = time(s"setsim ${n}x")(ops.SetSim.jaccardSelfJoin(docsN).count())
    val qsBm = docs1.where(col("doc_id") < 4)
      .select(col("doc_id").cast("string").as("query_id"), col("text").as("qtext"))
      .localCheckpoint()
    val bm1 = time("bm25 1x")(ops.Retrieval.bm25Scores(docs1, qsBm).count())
    val bmN = time(s"bm25 ${n}x")(ops.Retrieval.bm25Scores(docsN, qsBm).count())
    val pc1 = time("pca gram 1x")(ops.Pca.moments(emb1).n)
    val pcN = time(s"pca gram ${n}x")(ops.Pca.moments(embN).n)
    println(f"round-6c ratios at ${n}x: setsim=${ssN / ss1}%.1f bm25=${bmN / bm1}%.1f " +
      f"pca=${pcN / pc1}%.1f (bm25/pca linear would be <= $n)")

    // SemDeDup: with nClusters FIXED, replication multiplies cluster
    // occupancy by N and the within-cluster pair join by ~N² — that is the
    // documented failure mode, and the documented production answer is to
    // scale nClusters with the corpus so occupancy stays constant. Observe
    // both: fixed-k (super-linear, expected) vs scaled-k (near-linear).
    val sd1 = time("semdedup 1x k=8")(
      ops.SemDedup.semDedup(emb1, minCos = 0.95, nClusters = 8, maxIter = 4).count())
    val sdF = time(s"semdedup ${n}x k=8")(
      ops.SemDedup.semDedup(embN, minCos = 0.95, nClusters = 8, maxIter = 4).count())
    val sdS = time(s"semdedup ${n}x k=${8 * n}")(
      ops.SemDedup.semDedup(embN, minCos = 0.95, nClusters = 8 * n, maxIter = 4).count())
    println(f"semdedup ratios at ${n}x: fixed-k=${sdF / sd1}%.1f scaled-k=${sdS / sd1}%.1f " +
      f"(scaled-k is the production path; linear would be <= $n)")

    // round-7: curation reporting + training-order assembly. All four are
    // one-scan shapes — report is a nested-when + K-row agg; shuffle/
    // interleave are one per-shard/per-source window; split is a pure
    // projection + small agg — so ratios should track row count (<= N).
    val cascade = Seq(
      "too_short" -> (length(col("text")) >= 120),
      "low_alpha" -> (length(regexp_replace(col("text"), "[^A-Za-z]", "")) * 50L >=
        length(col("text")) * 41L))
    val fr1 = time("filter report 1x")(ops.Filters.filterReport(docs1, cascade).count())
    val frN = time(s"filter report ${n}x")(ops.Filters.filterReport(docsN, cascade).count())
    val sh1 = time("det shuffle 1x")(
      ops.Shuffling.deterministicShuffle(docs1, col("doc_id"), 32, 7L).count())
    val shN = time(s"det shuffle ${n}x")(
      ops.Shuffling.deterministicShuffle(docsN, col("doc_id"), 32, 7L).count())
    val il1 = time("interleave 1x")(ops.Shuffling.weightedInterleave(Seq(
      ("a", docs1.where(col("doc_id") % 2 === 0).select("doc_id"), 3),
      ("b", docs1.where(col("doc_id") % 2 === 1).select("doc_id"), 1)),
      "doc_id", 7L).count())
    val ilN = time(s"interleave ${n}x")(ops.Shuffling.weightedInterleave(Seq(
      ("a", docsN.where(col("doc_id") % 2 === 0).select("doc_id"), 3),
      ("b", docsN.where(col("doc_id") % 2 === 1).select("doc_id"), 1)),
      "doc_id", 7L).count())
    val sp1 = time("hash split 1x")(ops.Sampling.hashSplit(docs1, col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.1)).groupBy("split").count().count())
    val spN = time(s"hash split ${n}x")(ops.Sampling.hashSplit(docsN, col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.1)).groupBy("split").count().count())
    println(f"round-7 ratios at ${n}x: report=${frN / fr1}%.1f shuffle=${shN / sh1}%.1f " +
      f"interleave=${ilN / il1}%.1f split=${spN / sp1}%.1f (linear would be <= $n)")

    // round-7b: dense index over an Nx item table (range-rank — linear) and
    // negative sampling with a FIXED anchor set against the Nx index (draw
    // count fixed ⇒ join cost tracks draws, not items — should be ~flat)
    val anchors1 = docs1.where(col("doc_id") % 37 === 0).select(col("doc_id").as("anchor"))
    val pos0 = anchors1.select(col("anchor"), col("anchor").as("item"))
    val oi1 = time("ordered index 1x")(
      ops.Shuffling.orderedIndex(docs1.select(col("doc_id")), "doc_id").count())
    val oiN = time(s"ordered index ${n}x")(
      ops.Shuffling.orderedIndex(docsN.select(col("doc_id")), "doc_id").count())
    val ns1 = time("neg sample 1x items")(ops.Shuffling.negativeSample(
      anchors1, "anchor", docs1.select(col("doc_id").as("item")), "item",
      pos0, k = 5, nDraws = 12, seed = 7L).count())
    val nsN = time(s"neg sample ${n}x items")(ops.Shuffling.negativeSample(
      anchors1, "anchor", docsN.select(col("doc_id").as("item")), "item",
      pos0, k = 5, nDraws = 12, seed = 7L).count())
    println(f"round-7b ratios at ${n}x: index=${oiN / oi1}%.1f negsample=${nsN / ns1}%.1f " +
      f"(index linear would be <= $n; negsample with fixed anchors should be ~flat)")

    // round-8: multi-benchmark decontamination (fixed eval sets, Nx corpus
    // — one scan regardless of benchmark count), corpus diff (narrow hash
    // + one join — linear), image near-dups (decode + banded hamming over
    // 8-byte hashes — linear in images, candidates bounded by buckets)
    val evals = Seq("b97" -> docs1.where(col("doc_id") % 97 === 0),
      "b89" -> docs1.where(col("doc_id") % 89 === 0))
    val cm1 = time("contam matrix 1x")(
      ops.Curation.contaminationMatrix(docs1, evals).count())
    val cmN = time(s"contam matrix ${n}x")(
      ops.Curation.contaminationMatrix(docsN, evals).count())
    val v2docs1 = docs1.where(col("doc_id") % 13 =!= 0)
    val v2docsN = docsN.where(col("doc_id") % 13 =!= 0)
    val cd1 = time("corpus diff 1x")(ops.Curation.corpusDiff(docs1, v2docs1).count())
    val cdN = time(s"corpus diff ${n}x")(ops.Curation.corpusDiff(docsN, v2docsN).count())
    def imgSpec(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      col("doc_id").as("pattern_id"), (length(col("text")) % 37 + 16).as("n"),
      lit(false).as("perturb"))
    val in1 = time("image neardups 1x")(ops.Multimodal.imageNearDups(
      ops.Multimodal.asPatternedPngMediaTable(imgSpec(docs1)), maxHamming = 4).count())
    val inN = time(s"image neardups ${n}x")(ops.Multimodal.imageNearDups(
      ops.Multimodal.asPatternedPngMediaTable(imgSpec(docsN)), maxHamming = 4).count())
    println(f"round-8 ratios at ${n}x: contam=${cmN / cm1}%.1f diff=${cdN / cd1}%.1f " +
      f"imgdedup=${inN / in1}%.1f (all linear would be <= $n)")
    spark.stop()
  }
}
