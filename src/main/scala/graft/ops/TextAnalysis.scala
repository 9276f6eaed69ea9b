package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All operators are pure Column expressions (whole-stage-codegen friendly; no
  * UDFs, no shuffles except where an aggregation is the point), so they scale
  * linearly with input splits on a large cluster.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword pre-tokenization: letter runs, single digits, or single
    * non-alphanumeric marks (a deterministic, regex-only approximation of a
    * byte-level BPE pre-tokenizer). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))

  /** Per-document token statistics: whitespace tokens + BPE-ish token count. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spread(docs).select(
      col("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      size(bpeTokens(col(textCol))).cast("long").as("n_bpe_tokens"),
      size(array_distinct(tokens(col(textCol)))).cast("long").as("n_distinct_tokens"))

  /** Quality-scoring signals: length, mean token length, punctuation ratio,
    * stopword ratio, alphabetic ratio, uniqueness ratio. */
  def qualitySignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    val nChars = length(t).cast("double")
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    Par.spread(docs).select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      Portable.round((nChars - size(toks).cast("double") + lit(1)) / nTok, 4).as("mean_token_len"),
      Portable.round(length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / nChars, 4)
        .as("punct_ratio"),
      Portable.round(size(filter(toks, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
        .cast("double") / nTok, 4).as("stopword_ratio"),
      Portable.round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / nChars, 4)
        .as("alpha_ratio"),
      Portable.round(size(array_distinct(toks)).cast("double") / nTok, 4).as("uniqueness"))
  }

  /** Language-marker stopword sets used by [[languageId]]; kept tiny and
    * deterministic so the identical heuristic is expressible in ANSI SQL. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  /** N-gram/stopword-heuristic language ID: score = count of marker-word hits
    * per language; argmax with deterministic tie-break by [[langMarkers]]
    * list position (earlier entry wins — en, es, de, fr), score 0 → "und"
    * (undetermined). */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = langMarkers.map { case (lang, ws) =>
      struct(
        size(filter(toks, x => x.isin(ws.map(_.asInstanceOf[Any]): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max picks (max score, then max lang); to tie-break by lang ASC we
    // order on (score, reversed-lang) — with a fixed 2-char code set, flipping
    // sort order via a sortable complement: use negative of lang rank.
    val ranked = langMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      struct(
        size(filter(toks, x => x.isin(ws.map(_.asInstanceOf[Any]): _*))).as("score"),
        lit(-i).as("nrank"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(ranked: _*))
    Par.spread(docs).select(
      col("doc_id"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("pred_lang"),
      best.getField("score").cast("long").as("lang_score"))
  }

  /** Document fingerprint: md5 of case-folded, punctuation-stripped,
    * whitespace-collapsed text — a deterministic rolling-hash stand-in that is
    * reproducible in any engine. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")))

  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spread(docs).select(col("doc_id"), fingerprint(col(textCol)).as("fp"))

  /** PII patterns used by [[scrubPii]]: POSIX-class-only regexes (no
    * lookaround, no shorthand classes) so Java regex (Spark) and RE2-style
    * engines (DuckDB, Trino) match identically. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val phoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII redaction for training corpora: emails, IPv4 addresses, then
    * phone-like digit runs are replaced with typed placeholders, in that
    * fixed order (each count is taken on the text AFTER the previous
    * substitution, so an address never double-counts as a phone number).
    * Pure per-row Column expressions — no shuffle, scales with splits. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val s0 = col(textCol)
    val s1 = regexp_replace(s0, emailRe, "<EMAIL>")
    val s2 = regexp_replace(s1, ipv4Re, "<IP>")
    val s3 = regexp_replace(s2, phoneRe, "<PHONE>")
    Par.spread(docs).select(
      col("doc_id"),
      s3.as("clean_text"),
      regexp_count(s0, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(s1, lit(ipv4Re)).cast("long").as("n_ips"),
      regexp_count(s2, lit(phoneRe)).cast("long").as("n_phones"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1: "repetitious
    * documents are ... removed" via duplicate n-gram fractions): per document,
    * the mass of the most common word n-gram and of all duplicated n-grams,
    * as fractions of the n-gram total.
    *
    * Output: (doc_id, top_2gram_frac, dup_2gram_frac, dup_3gram_frac); docs
    * too short to form an n-gram score 0.0. Two explode→count→agg passes —
    * each is one map-side-combinable shuffle keyed by (doc_id, gram), so
    * skew is bounded by document length, not corpus size.
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ONE tokenize+explode pass for both gram sizes (r15, guide §2.3/§2.4):
    // 2-grams and 3-grams ride the same exploded relation under an `n` tag,
    // so the corpus is scanned and tokenized once and both aggregations
    // share one shuffle chain keyed (doc_id, n, g) — the previous
    // two-subquery form scanned and shuffled the corpus once per gram size.
    // Same per-(doc,n) totals, same joins, same output values.
    val grams = Par.spread(docs)
      .select(col("doc_id"), explode(array(
        struct(lit(2).as("n"), Dedup.shingleArray(col(textCol), 2).as("gs")),
        struct(lit(3).as("n"), Dedup.shingleArray(col(textCol), 3).as("gs")))).as("e"))
      .select(col("doc_id"), col("e.n").as("n"), explode(col("e.gs")).as("g"))
    // pivot both gram sizes in ONE aggregation (filtering a shared `stats`
    // twice would re-execute the whole gram pipeline per branch); a doc with
    // 2-grams but no 3-grams (2-token text) gets null 3-gram columns →
    // null frac → the same coalesce(0.0) as the old per-size left joins
    val perDoc = grams
      .groupBy(col("doc_id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n")).agg(
        sum("c").as("total"), max("c").as("maxc"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupmass"))
      .groupBy(col("doc_id")).agg(
        max(when(col("n") === 2, col("maxc"))).as("maxc2"),
        max(when(col("n") === 2, col("dupmass"))).as("dup2"),
        max(when(col("n") === 2, col("total"))).as("tot2"),
        max(when(col("n") === 3, col("dupmass"))).as("dup3"),
        max(when(col("n") === 3, col("total"))).as("tot3"))
    val frac = (num: Column, total: Column) =>
      Portable.round(num.cast("double") / total.cast("double"), 4)
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(frac(col("maxc2"), col("tot2")), lit(0.0)).as("top_2gram_frac"),
        coalesce(frac(col("dup2"), col("tot2")), lit(0.0)).as("dup_2gram_frac"),
        coalesce(frac(col("dup3"), col("tot3")), lit(0.0)).as("dup_3gram_frac"))
  }

  /** Canonical text normalization for hashing/dedup: Unicode NFC (native
    * codegen'd expression — two byte sequences rendering identically must
    * hash identically), lowercase, trim, single-space whitespace. Run this
    * BEFORE any fingerprint/shingle/minhash stage; it is a pure narrow map. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(graft.functions.Native.nfcNormalize(text))),
      "\\s+", " ")

  /** Corpus bigram language-model quality score (the KenLM-style perplexity
    * filter of CCNet/Gopher, reduced to a self-trained bigram model): train
    * add-k-smoothed bigram probabilities on the corpus itself, then score
    * each document by its summed bigram log-probability. Low scores flag
    * text whose word transitions are atypical for the corpus (boilerplate,
    * gibberish, wrong-language fragments).
    *
    * Output: (doc_id, n_bigrams, sum_logprob_micros) — the per-bigram
    * ln((c(w₁w₂)+k)/(c(w₁)+k·V)) is micro-rounded to an INTEGER before the
    * per-doc sum, so the aggregate is order-independent and engine-portable
    * (the q71 TF-IDF pattern); divide by n_bigrams for the mean.
    *
    * Scale: two count aggregations (bigram, unigram) + one join of the
    * bigram stream against the bigram model, all keyed by uniform-ish token
    * keys — one shuffle each. The unigram model is broadcast. Documents too
    * short for a bigram emit (0, 0). */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
      k: Double = 1.0): DataFrame = {
    // `toks` feeds FOUR consumers (bigrams→{counts, scored}, unigram counts,
    // vocab size) — materialize it once instead of re-running
    // tokenize+explode per consumer; `bigrams` likewise feeds two, saving a
    // second window shuffle+sort (r15, guide §2.4). The vocab size rides
    // into the plan as a broadcast 1-row aggregate instead of a separate
    // collect action — same double arithmetic (k·V computed in IEEE double
    // either way), one action total.
    val toks = Par.spread(docs).select(col("doc_id"),
      posexplode(graft.lib.Features.tokenizeGaps(col(textCol))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val bigrams = toks
      .select(col("doc_id"), lag(col("tok"), 1).over(w).as("w1"), col("tok").as("w2"))
      .where(col("w1").isNotNull)
      .localCheckpoint()
    val bigramCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val unigramCounts = toks.groupBy(col("tok").as("w1")).agg(count(lit(1)).as("c1"))
    val vocabDf = toks.agg(countDistinct("tok").cast("double").as("__v"))
    val scored = bigrams
      .join(bigramCounts, Seq("w1", "w2"))
      .join(broadcast(unigramCounts), Seq("w1"))
      .crossJoin(broadcast(vocabDf))
      .select(col("doc_id"),
        floor(log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("__v"))) * 1e6 + 0.5)
          .cast("long").as("lp_micros"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum("lp_micros").as("sum_logprob_micros"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_logprob_micros"), lit(0L)).as("sum_logprob_micros"))
  }

  /** CORPUS-level duplicated-n-gram fraction per document: the share of a
    * document's distinct n-gram shingles that occur in at least `minDocs`
    * documents corpus-wide (the cross-document companion to the within-doc
    * [[repetitionSignals]]; high values flag boilerplate shared across many
    * pages — the RefinedWeb/Gopher "duplicated n-gram" filter).
    *
    * Output: (doc_id, n_shingles, n_dup, dup_frac_micros).
    *
    * Scale: one doc-frequency aggregation over the hashed-shingle relation
    * (map-side combinable, uniform 8-byte keys) + one join of that relation
    * back to its own per-shingle counts — the same shuffle shape as TF-IDF.
    * No quadratic stage; hot shingles skew the join key, but the count
    * relation is tiny (one row per distinct shingle) and broadcasts/AQE
    * handles residual skew. */
  def dupNgramFraction(docs: DataFrame, textCol: String = "text",
      n: Int = 3, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1: $minDocs")
    val sh = Dedup.hashedShingles(docs, textCol, n)
    val docFreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(docFreq, "shingle")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("df") >= minDocs, 1)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        floor(col("n_dup").cast("double") / col("n_shingles").cast("double")
          * lit(1e6) + lit(0.5)).cast("long").as("dup_frac_micros"))
  }

  /** Exact duplicated-SPAN detection (the distributed shape of
    * suffix-array substring dedup, Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better"): token positions whose n-gram
    * shingle occurs in ≥ `minDocs` documents corpus-wide, merged into
    * maximal per-document spans `(doc_id, span_start, span_end,
    * n_shingles)` — the spans a substring-dedup pass would cut. Positions
    * are 0-based token offsets; a span of shingles [i..j] covers tokens
    * [i, j+n-1], reported as span_end exclusive.
    *
    * Scale: positional shingles are a narrow map; the df filter is one
    * aggregation + a semi-join against the (tiny, df≥minDocs) hot-shingle
    * relation; span merging is ONE window pass partitioned by doc (the
    * classic pos − row_number() islands trick — no iteration). */
  def duplicatedSpans(docs: DataFrame, textCol: String = "text",
      n: Int = 3, minDocs: Int = 2): DataFrame = {
    val posSh = Par.spread(docs)
      .where(size(split(trim(col(textCol)), "\\s+")) >= n)
      .select(col("doc_id"),
        posexplode(transform(Dedup.shingleArray(col(textCol), n),
          s => xxhash64(s))).as(Seq("pos", "shingle")))
    val hot = posSh.select("doc_id", "shingle").distinct()
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
    val dup = posSh.join(hot.select("shingle"), Seq("shingle"), "semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + lit(n)).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .drop("island")
  }

  /** Per-document Shannon entropy (nats) of the whitespace-token
    * distribution — a lexical-diversity quality signal (low entropy ⇒
    * repetitive/boilerplate text). Computed as ln(n) − (Σ c·ln c)/n over
    * per-token counts c, which keeps the FP term count at one-per-distinct-
    * token. Each c·ln(c) term is micro-rounded to an INTEGER before the
    * per-doc sum (the bigramLogProb pattern), so the aggregate is
    * order-independent and engine-portable; `ent_micros` is derived from
    * those exact integers by one final expression both engines mirror
    * verbatim. Output: (doc_id, n_tokens, ent_micros, entropy).
    * Two map-side-combinable aggregations: (doc, token) then doc. */
  def tokenEntropy(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spread(docs)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("t"))
      .where(length(col("t")) > 0)
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long")).as("s_micros"))
      .select(col("doc_id"), col("n_tokens"),
        floor((log(col("n_tokens").cast("double"))
          - (col("s_micros").cast("double") / lit(1e6))
            / col("n_tokens").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("ent_micros"))
      .withColumn("entropy", col("ent_micros").cast("double") / lit(1e6))

  /** gzip-compressibility quality signal (the RefinedWeb/FineWeb-style
    * "compression ratio" filter): deflate the UTF-8 text at a FIXED level
    * and report compressed·1000/raw (milli-ratio, integer). Natural prose
    * sits in a narrow band; templated/repetitive machine text compresses
    * far below it — a cheap, language-agnostic repetition detector that
    * complements the token-level signals above. Deterministic: `Deflater`
    * at a fixed level/strategy is a pure function of the bytes (zlib ships
    * in the JDK). The kernel is the native codegen expression
    * [[graft.functions.DeflateSize]] (one thread-local Deflater per
    * executor thread, reset per value), so the whole signal is ONE
    * columnar projection inside whole-stage codegen — no object round
    * trip, no shuffle. Output: (doc_id, n_bytes, comp_milli). */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .select(col(idCol),
        octet_length(col("__t")).cast("long").as("n_bytes"),
        graft.functions.Native.deflateSize(col("__t")).as("__c"))
      .select(col(idCol), col("n_bytes"),
        // long division exactly as the JDK form: (c * 1000) div n, both
        // positive; the empty-text guard keeps `div` away from zero
        when(col("n_bytes") === 0L, lit(1000L))
          .otherwise(expr("__c * 1000L div n_bytes")).as("comp_milli"))

  /** Corpus-wide EXACT paragraph deduplication with document
    * reconstruction — the CCNet/RefinedWeb line-level pass that runs
    * before document-level near-dup: split each doc on `sep`, keep only
    * the FIRST occurrence of each distinct non-blank paragraph
    * corpus-wide (first = smallest (doc_id, position) — deterministic on
    * any engine at any parallelism), and rebuild every document from its
    * surviving paragraphs in original order (documents losing every
    * paragraph come back empty, never dropped).
    *
    * Scale shape: the keeper per distinct paragraph is ONE map-side
    * combinable `min(struct(doc, pos))` aggregation keyed by the
    * paragraph's md5 (a boilerplate paragraph repeated a billion times
    * combines per partition — no giant-group window sort), one equi-join
    * back on (hash, doc, pos), one grouped rebuild via sorted
    * `collect_list` (bounded by a document's own paragraph count). */
  def dedupParagraphs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n\n"): DataFrame = {
    val parts = paragraphRelation(docs, idCol, textCol, sep)
    val keeper = parts.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("pos"))).as("__k"))
      .select(col("__h").as("__hk"),
        col(s"__k.$idCol").as("__kd"), col("__k.pos").as("__kp"))
    val kept = parts.join(keeper,
        col("__h") === col("__hk") &&
          col(idCol) === col("__kd") && col("pos") === col("__kp"))
      .select(col(idCol), col("pos"), col("par"))
    rebuildDocs(docs, kept, idCol, textCol, sep)
  }

  /** Boilerplate stripping — the OTHER paragraph-level pass: a paragraph
    * appearing in MORE THAN `maxDocs` distinct documents (nav bars,
    * cookie banners, licence footers) is removed from EVERY document,
    * first occurrence included — unlike [[dedupParagraphs]], which keeps
    * exactly one copy. One exact distinct-count per paragraph hash, one
    * anti-join of the (small) boilerplate hash set, one grouped rebuild. */
  def stripBoilerplate(docs: DataFrame, maxDocs: Long,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = "\n\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1: $maxDocs")
    val parts = paragraphRelation(docs, idCol, textCol, sep)
    val common = parts.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") > maxDocs)
      .select(col("__h").as("__hb"))
    val kept = parts.join(common, col("__h") === col("__hb"), "left_anti")
      .select(col(idCol), col("pos"), col("par"))
    rebuildDocs(docs, kept, idCol, textCol, sep)
  }

  /** (id, pos, par, __h) for every non-blank paragraph of every doc. */
  private def paragraphRelation(docs: DataFrame, idCol: String,
      textCol: String, sep: String): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "par")))
      .where(length(trim(col("par"))) > 0)
      .withColumn("__h", md5(col("par")))

  /** Rebuild every source document from its kept (id, pos, par) rows in
    * original order; documents with nothing kept come back empty. */
  private def rebuildDocs(docs: DataFrame, kept: DataFrame, idCol: String,
      textCol: String, sep: String): DataFrame = {
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("par")))),
          s => s.getField("par")), sep).as(textCol))
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
