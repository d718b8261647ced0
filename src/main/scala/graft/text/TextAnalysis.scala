package graft.text

import graft.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over `documents` (SURVEY.md §2.5).
  *
  * Everything is built from codegen'd `functions._` expressions —
  * regex splits, higher-order array functions, digests — no UDFs, so
  * the whole stage stays inside WholeStageCodegen and scales linearly
  * with no shuffle except the final small aggregations.
  */
object TextAnalysis {

  /** §2.5 `text_length_profile` — document-length distribution per
    * (lang, source) segment: exact p10/p50/p90 of `n_chars` plus the
    * count — the mixture-QA readout that catches a truncated or
    * boilerplate-heavy slice before it trains. Exact quantiles ride
    * the distributed rank join ([[graft.analytics.Quantiles.exact]])
    * on the composite segment key; output is the bounded segment
    * grid.
    */
  def textLengthProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(concat(col("lang"), lit("/"), col("source")).as("seg"),
        col("n_chars"))
    val qs = graft.analytics.Quantiles.exact(docs, "seg", "n_chars",
      Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
    docs.groupBy(col("seg")).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(qs), Seq("seg"))
      .select(col("seg"), col("n_docs"), round(col("p10"), 4).as("p10"),
        round(col("p50"), 4).as("p50"), round(col("p90"), 4).as("p90"))
      .orderBy(col("seg"))
  }

  /** Whitespace tokenization shared by the operators; lower-cased. */
  def tokensCol(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** §2.5#281 — per-document character entropy: the compression-proxy
    * quality signal (template spam and OCR-garble sit at the two
    * extremes of the distribution). Computed entirely WITHIN the row
    * by higher-order functions — no explode, no shuffle: char list →
    * per-distinct-char counts → H = log2(n) − (Σ c·log2 c)/n.
    *
    * Float-determinism fence: the Σ c·log2 c terms are scaled to
    * exact longs (round(x·10⁶)) before summation, so the fold order
    * cannot perturb the result — both engines sum identical integers
    * and perform the identical final IEEE ops. Costs ≤1e-6·|alphabet|
    * absolute entropy error, far under the 4-decimal rounding.
    * If this pass ever dominates a profile, the native-expression
    * path (single byte-histogram scan, like [[NGramDupStats]]) is
    * the drop-in upgrade.
    */
  /** §2.5#283 — per-document keyword extraction: top-3 terms by
    * tf·idf — the metadata-enrichment step that tags each training
    * document with its salient vocabulary. One (doc, term) shuffle
    * with map-side combine for tf, one bounded term-keyed df table
    * (broadcast-joined back), the corpus size as a broadcast scalar,
    * and a doc-partitioned rank window (bounded per doc, spillable
    * across docs) for the cut. Ordering uses the ROUNDED score +
    * term tie-break so the cut is deterministic across engines.
    */
  def textTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val pairs = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("term"))
    val tf = pairs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = pairs.distinct().groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("nd").cast("double") / col("df")), 4)
          .as("tfidf"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  def textCharEntropy(spark: SparkSession, dir: String): DataFrame =
    // the histogram runs in the native one-pass CharHistStats kernel:
    // the first HOF formulation (per-distinct-char `filter` counting)
    // was O(distinct x length) per document and surfaced as the
    // slowest query of the 10x stress pass (82 s at sf1); the kernel
    // is one HashMap pass per row, O(length), same scaled-long fence
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.char_hist_stats(col("text")).as("st"))
      .select(col("doc_id"), col("lang"),
        col("st.n").as("n_chars_counted"),
        col("st.k").as("n_distinct_chars"),
        round(
          log2(col("st.n").cast("double")) -
            (col("st.sum_scaled").cast("double") / 1e6) /
              col("st.n").cast("double"),
          4).as("char_entropy"))
      .orderBy(col("doc_id"))

  /** 1..n index sequence that degrades to an empty array when n < 1.
    * Bare `sequence(lit(1), n)` defaults to step -1 when n < 1 and
    * yields [1, 0, ...], whose 0/negative indices crash or silently
    * wrap `element_at` — short/empty docs must produce no n-grams
    * (matching the oracle's `range(1, n+1)` semantics) instead.
    */
  def idxSeq(n: Column): Column =
    when(n >= 1, sequence(lit(1), n)).otherwise(array().cast("array<int>"))

  /** §2.5#36 — token counting: whitespace tokens plus a word-regex
    * token count (BPE-ish pre-tokenizer shape: runs of letters, runs
    * of digits, or single punctuation marks).
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(tokensCol(col("text"))).cast("long").as("n_ws_tokens"),
        size(split(trim(col("text")), "[a-zA-Z]+")).cast("long").minus(1).as("n_word_splits"),
        length(col("text")).cast("long").as("len_chars"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** §2.5#37 — quality scoring: length stats, whitespace/character
    * ratios, mean token length, stopword ratio, and a composite score
    * in [0,1]. All pure arithmetic over one scan.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val nToks = size(toks).cast("double")
    val lenC = length(col("text")).cast("double")
    val nSpace = (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))).cast("double")
    val stopHits = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val meanTok = (lenC - nSpace) / nToks
    val stopRatio = stopHits / nToks
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("len_chars"),
        size(toks).cast("long").as("n_tokens"),
        round(meanTok, 4).as("mean_token_len"),
        round(nSpace / lenC, 4).as("space_ratio"),
        round(stopRatio, 4).as("stopword_ratio"),
        round((lit(1.0) - stopRatio) * least(lit(1.0), nToks / 50.0), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** §2.5 `text_quality_sweep` — the quality-gate tuning curve: how
    * many documents survive at score thresholds {0.3, 0.5, 0.7, 0.9},
    * from ONE scoring pass (the same formula as [[textQuality]])
    * swept against a broadcast 4-row grid. Picking the gate's
    * strictness is a retention-vs-purity tradeoff; this emits the
    * curve that decision reads.
    */
  def textQualitySweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokensCol(col("text"))
    val nToks = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val scored = Tables.documents(spark, dir)
      .select(round((lit(1.0) - stopHits / nToks) *
        least(lit(1.0), nToks / 50.0), 4).as("q"))
    val total = Tables.documents(spark, dir).count()
    val th = Seq(0.3, 0.5, 0.7, 0.9).toDF("threshold")
    th.join(scored.crossJoin(broadcast(th)).filter(col("q") >= col("threshold"))
        .groupBy(col("threshold")).agg(count(lit(1)).as("n_pass")),
        Seq("threshold"), "left_outer")
      .na.fill(0L, Seq("n_pass"))
      .withColumn("pct_pass",
        round(col("n_pass").cast("double") / lit(total.toDouble) * 100, 2))
      .orderBy(col("threshold"))
  }

  /** §2.5#38 — language ID: stopword-marker voting. Each candidate
    * language scores by hits of its top function-words in the token
    * stream; highest vote wins, ties and zero-evidence fall back to
    * 'und' (undetermined). The marker lists are tiny broadcast-free
    * literals so this is a narrow codegen'd pass.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast("long")
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val es = hits(Seq("el", "la", "los", "y", "es"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"))
      .withColumn("predicted_lang",
        when(greatest(col("en_hits"), col("de_hits"), col("es_hits"), col("fr_hits")) === 0, lit("und"))
          .when(col("en_hits") >= greatest(col("de_hits"), col("es_hits"), col("fr_hits")), lit("en"))
          .when(col("de_hits") >= greatest(col("es_hits"), col("fr_hits")), lit("de"))
          .when(col("es_hits") >= col("fr_hits"), lit("es"))
          .otherwise(lit("fr")))
      .orderBy(col("doc_id"))
  }

  /** §2.5#179 — line-level dedup accounting (the C4 cleaning rule:
    * drop any sentence/line that occurs in ≥ 3 documents). Segments
    * are period-split, normalized, and hashed; global segment
    * frequencies come from one distinct+groupBy pass keyed on the
    * segment hash, broadcast back is avoided by re-joining on the
    * hash (the frequency table is corpus-wide at 100 TB). Output is
    * the per-document kept/dropped accounting a cleaning pipeline
    * reports.
    */
  def textLineDedup(spark: SparkSession, dir: String): DataFrame = {
    val segs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(split(col("text"), "\\.")).as("seg"))
      .select(col("doc_id"), trim(lower(col("seg"))).as("seg"))
      .filter(length(col("seg")) > 0)
      .select(col("doc_id"), md5(col("seg")).as("seg_hash"))
    val freq = segs.select(col("doc_id"), col("seg_hash")).distinct()
      .groupBy(col("seg_hash")).agg(count(lit(1)).as("n_docs_with"))
    segs.join(freq, Seq("seg_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("n_docs_with") >= 3, 1L).otherwise(0L)).as("n_boilerplate"))
      // exact-count quotient, emitted unrounded (tie-attractor rule)
      .withColumn("keep_ratio",
        (col("n_segments") - col("n_boilerplate")).cast("double") /
          col("n_segments"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#177 — language-ID confusion matrix: predicted vs true
    * language with per-true-language shares — the eval readout that
    * tells a pipeline which languages its classifier is silently
    * mislabeling. Bounded |langs|² rollup over the langid pass.
    */
  def textLangidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val byTrue = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    textLangid(spark, dir)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      // exact-count quotient, emitted unrounded (tie-attractor rule)
      .withColumn("share_of_true",
        col("n_docs").cast("double") / sum(col("n_docs")).over(byTrue))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  /** §2.5#39 — document fingerprint: digest of the
    * alphanumeric-normalized text (case/punct/whitespace-insensitive
    * identity), plus the size of each fingerprint's duplicate
    * cluster. The digest shuffle is the only exchange.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fp.as("fingerprint"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#65 — winnowing fingerprints (rolling-hash document
    * signatures, MOSS-style): hash every k-gram character window,
    * then keep the minimum hash of each w-window of consecutive
    * k-grams; the distinct selected hashes are the document's
    * fingerprint set, robust to local edits. Output is the set size
    * plus a digest of the sorted set so the oracle compare stays
    * compact. Narrow per-doc computation, no shuffle until the final
    * order.
    */
  def textWinnowing(spark: SparkSession, dir: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"),
        graft.functions.TextFunctions.winnow_fingerprints(col("text"), k, w).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        md5(concat_ws("", col("fps"))).as("fp_digest"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#109 — quality FILTER rules (Gopher/C4-style): the pass/fail
    * gate a pretraining pipeline applies per document — token-count
    * window, mean-token-length window, symbol-character ratio cap,
    * and a stopword-evidence floor. Booleans only (no floats), so the
    * oracle compare is exact with zero rounding; one narrow codegen
    * pass, no shuffle.
    */
  def textQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val nToks = size(toks).cast("double")
    val lenC = length(col("text")).cast("double")
    val nSpace = (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))).cast("double")
    val meanTok = (lenC - nSpace) / nToks
    val symbols = length(regexp_replace(lower(col("text")), "[a-z0-9 ]", "")).cast("double")
    val stopHits = size(filter(toks, t =>
      t === "the" || t === "a" || t === "of" || t === "and" || t === "is"))
    val okLen = size(toks) >= 5 && size(toks) <= 10000
    val okTokLen = meanTok >= 2.0 && meanTok <= 12.0
    val okSymbol = symbols / lenC <= 0.25
    val okStop = stopHits >= 1
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        okLen.as("ok_token_count"),
        okTokLen.as("ok_mean_token_len"),
        okSymbol.as("ok_symbol_ratio"),
        okStop.as("ok_stopword_evidence"),
        (okLen && okTokLen && okSymbol && okStop).as("passes"))
      .orderBy(col("doc_id"))
  }

  /** §2.5 — heavy hitters per language via the mergeable Misra–Gries
    * sketch ([[graft.functions.FreqItemsAgg]]): top-5 tokens per lang
    * from a bounded O(capacity) buffer with map-side combine — the
    * 100 TB answer to "most frequent tokens" when the full vocabulary
    * doesn't fit a groupBy. Capacity 64 exceeds this corpus's
    * vocabulary, so the sketch is in its exact regime and the oracle
    * compares true counts.
    */
  def textFreqTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokensCol(col("text"))).as("token"))
    val sketched = toks.groupBy(col("lang"))
      .agg(graft.functions.FreqItemsAggFunctions.freq_items_sketch(col("token"), 64).as("sketch"))
      .select(col("lang"), explode(col("sketch")).as(Seq("token", "cnt")))
    val rnk = row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("token")))
    sketched.withColumn("rnk", rnk.cast("long")).filter(col("rnk") <= 5)
      .orderBy(col("lang"), col("rnk"))
  }

  /** Misra–Gries capacity and report divisor for
    * [[textHeavyHittersExact]]. Exactness needs report threshold
    * n/[[HhReportDiv]] STRICTLY above the MG loss bound
    * n/([[HhCapacity]]+1): 128 < 257, comfortably.
    */
  val HhCapacity = 256
  val HhReportDiv = 128L

  /** §2.5#302 — EXACT corpus-wide heavy hitters via the two-pass
    * Misra–Gries protocol: pass 1 sketches candidates in an
    * O(capacity) buffer (every token with true count > n/(cap+1)
    * provably survives the sketch — the classic MG guarantee), the
    * ≤[[HhCapacity]] survivors collect to a driver-side literal, and
    * pass 2 recounts ONLY those tokens exactly. Because the report
    * threshold n/[[HhReportDiv]] exceeds the loss bound n/(cap+1),
    * the reported set provably EQUALS the exact "count ≥ n/128" cut
    * at any corpus size — unlike the one-pass sketch
    * ([[textFreqTokens]]), whose counts are exact only below
    * capacity. This is the production pattern for exact heavy
    * hitters over a vocabulary no groupBy could hold: pass 1 is one
    * narrow map-side-combined pass, and pass 2's shuffle carries at
    * most `capacity` distinct keys regardless of corpus size.
    */
  def textHeavyHittersExact(spark: SparkSession, dir: String): DataFrame = {
    val toksDf = Tables.rebalanced(Tables.documents(spark, dir))
      .select(explode(tokensCol(col("text"))).as("token"))
    // bounded pushdown parameters: one long + ≤HhCapacity strings
    val row = toksDf
      .agg(count(lit(1)).as("n"), graft.functions.FreqItemsAggFunctions
        .freq_items_sketch(col("token"), HhCapacity).as("sk"))
      .select(col("n"), map_keys(col("sk")).as("cands"))
      .collect()(0)
    val total = row.getLong(0)
    val cands = row.getSeq[String](1)
    toksDf.filter(col("token").isInCollection(cands))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HhReportDiv >= total)
      .select(col("token"), col("cnt"),
        expr(s"(cnt * 10000) div CAST($total AS BIGINT)").as("share_bp"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** §2.5 — PII masking: the scrub pass a training-data pipeline runs
    * before anything ships — email addresses and long digit runs
    * replaced by typed placeholder tokens, with per-document match
    * accounting. The synthetic corpus carries no PII, so a
    * deterministic header (an address and an 8-digit id derived from
    * doc_id) is prepended on BOTH the engine and oracle sides, making
    * the regex path real while keeping the compare exact. One narrow
    * codegen pass (regexp_count + regexp_replace), no shuffle; at
    * 100 TB this runs inside the scan like every other row filter.
    */
  def textPiiMask(spark: SparkSession, dir: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numPat = "[0-9]{4,}"
    val aug = concat(lit("contact user"), col("doc_id").cast("string"),
      lit("@example.com ref "),
      lpad((col("doc_id") * 7919 + 13).cast("string"), 8, "0"),
      lit(" "), col("text"))
    val masked = regexp_replace(regexp_replace(aug, emailPat, "<EMAIL>"),
      numPat, "<NUM>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(aug, lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(aug, lit(numPat)).cast("long").as("n_long_numbers"),
        md5(masked).as("masked_digest"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#110 — repetition diagnostic: duplicate-n-gram ratios per
    * document (1 − distinct/total for 2-grams and 3-grams) — the
    * Gopher repetition signal that catches looping/boilerplate text.
    * One fused pass per document via the native
    * [[graft.functions.NGramDupStats]] kernel (the HOF
    * transform+array_distinct formulation materialized every n-gram
    * twice through interpreted lambdas — 4.5 s at sf0.1; the fused
    * kernel computes all four counts in one scan).
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    def dupRatio(total: Column, distinct: Column) =
      when(total > 0,
        round(lit(1.0) - distinct.cast("double") / total, 4))
        .otherwise(lit(0.0))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.ngram_dup_stats(tokensCol(col("text"))).as("s"))
      .select(col("doc_id"),
        col("s.n2").as("n_bigrams"),
        dupRatio(col("s.n2"), col("s.d2")).as("dup_bigram_ratio"),
        dupRatio(col("s.n3"), col("s.d3")).as("dup_trigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#111 — corpus boilerplate spans: the most frequent 5-token
    * spans across every document (shared headers/footers/templates a
    * cleaning pipeline strips). Explode is linear; the count shuffle
    * keys on the span; the global top-10 is a bounded TakeOrdered,
    * never a full sort.
    */
  def textCommonSpans(spark: SparkSession, dir: String): DataFrame = {
    val spans = transform(idxSeq(size(col("toks")) - 4),
      i => concat_ws(" ", (0 until 5).map(o => element_at(col("toks"), i + o)): _*))
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(tokensCol(col("text")).as("toks"))
      .select(explode(spans).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs_span"))
      .orderBy(col("n_docs_span").desc, col("span"))
      .limit(10)
  }

  /** §2.5#101 — token-length histogram corpus-wide: the vocabulary
    * shape diagnostic (explode → tiny bounded aggregate).
    */
  def textTokenLenHist(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(explode(tokensCol(col("text"))).as("tok"))
      .groupBy(length(col("tok")).cast("long").as("tok_len"))
      .agg(count(lit(1)).as("n_tokens"))
      .orderBy(col("tok_len"))

  /** §2.5#150 — Zipf fit per language: least-squares slope of
    * log-frequency over log-rank across the top 200 tokens — the
    * corpus-health diagnostic (natural text tracks slope ≈ −1;
    * templated/synthetic text deviates). One token-count shuffle,
    * a per-language top-200 rank cut (WindowGroupLimit regime), and
    * a closed-form regression on the bounded fit set — no iterative
    * solver, nothing driver-side.
    */
  def textZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(tokensCol(col("text"))).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("lang")).orderBy(col("freq").desc, col("token"))
    val fit = tf.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 200)
      .select(col("lang"), log(col("rnk").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    fit.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_fit"),
        ((count(lit(1)).cast("double") * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))) /
          (count(lit(1)).cast("double") * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))))
          .as("raw_slope"))
      .select(col("lang"), col("n_fit"),
        (round(col("raw_slope"), 4) + lit(0.0)).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  /** §2.5#96 — bigram language model: P(w2 | w1) for well-supported
    * bigrams, top-3 per language by conditional probability. Two
    * partial-agg shuffles (bigram counts, prefix counts) joined on
    * the bounded (lang, word) key.
    */
  /** §2.5#172 — perplexity-proxy quality score: each document's mean
    * negative log-likelihood under the corpus-wide per-language
    * bigram model (c(w1,w2)/c(w1)). The looping/templated text a
    * perplexity filter flags scores low; rare-construction text
    * scores high. Every doc bigram exists in the corpus model, so
    * the estimate needs no smoothing and stays a pure function of
    * the corpus. Shapes: two partial-agg count tables joined back on
    * the bigram key — the model is never driver-resident.
    */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docBg = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(transform(idxSeq(size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // lazy cut (r15, guide §2.4): three consumers (bigram counts,
      // prefix counts, the scoring join) — without it the corpus was
      // re-tokenized and re-exploded once per consumer
      .cutLineage(eager = false)
    val bgCounts = docBg.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
    val prefixCounts = docBg.groupBy(col("lang"), col("w1"))
      .agg(count(lit(1)).as("c_w1"))
    docBg
      .join(bgCounts, Seq("lang", "w1", "w2"))
      .join(prefixCounts, Seq("lang", "w1"))
      .select(col("doc_id"), (-log(col("c_bg").cast("double") / col("c_w1"))).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (round(avg(col("nll")), 4) + lit(0.0)).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** §2.5#303 — Kneser–Ney-smoothed perplexity scoring: each
    * document's mean negative log-likelihood under the corpus
    * per-language bigram model with interpolated KN smoothing
    * (absolute discount D = 0.75, continuation-probability backoff) —
    * the KenLM-style quality filter (CCNet) that, unlike the
    * unsmoothed [[textPerplexity]], assigns calibrated mass to rare
    * continuations instead of trusting raw conditional frequencies:
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1·) + D·T(w1)/c(w1·) · N1+(·w2)/B
    * where T(w1) = distinct continuations of w1, N1+(·w2) = distinct
    * predecessors of w2, B = bigram types. Every statistic is one
    * partial-aggregated count table on a bounded (lang, word) or
    * (lang, pair) key — the model is never driver-resident; the per-
    * language type total B is a broadcast-joined scalar row. Both
    * engines evaluate the identical arithmetic on the identical
    * integers, so the rounded score is deterministic.
    */
  def textPerplexityKn(spark: SparkSession, dir: String): DataFrame = {
    val D = 0.75
    val docBg = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(transform(idxSeq(size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // lazy cut (r15): consumed by the bigram-type aggregate AND the
      // scoring join — one tokenize+explode pass instead of two
      .cutLineage(eager = false)
    val bgc = docBg.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
      // lazy cut (r15): four consumers (prefix totals, continuation
      // fan-out, per-language type totals, the scoring join) re-ran
      // the full bigram aggregation each
      .cutLineage(eager = false)
    // prefix totals AND continuation fan-out in one pass over the
    // (already aggregated) bigram-type table
    val pref = bgc.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c_bg")).as("c_w1"), count(lit(1)).as("t_w1"))
    val cont = bgc.groupBy(col("lang"), col("w2"))
      .agg(count(lit(1)).as("n1_w2"))
    val bTypes = bgc.groupBy(col("lang")).agg(count(lit(1)).as("b_types"))
    val pKn =
      (col("c_bg") - lit(D)) / col("c_w1") +
        lit(D) * col("t_w1") / col("c_w1") *
          (col("n1_w2").cast("double") / col("b_types"))
    docBg
      .join(bgc, Seq("lang", "w1", "w2"))
      .join(pref, Seq("lang", "w1"))
      .join(cont, Seq("lang", "w2"))
      .join(broadcast(bTypes), Seq("lang"))
      .select(col("doc_id"), (-log(pKn)).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (round(avg(col("nll")), 4) + lit(0.0)).as("avg_nll_kn"))
      .orderBy(col("doc_id"))
  }

  def textBigramModel(spark: SparkSession, dir: String): DataFrame = {
    val toksDocs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), tokensCol(col("text")).as("toks"))
    val bigrams = toksDocs
      .select(col("lang"), explode(transform(idxSeq(size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bg"))
      .select(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // lazy cut (r15): bigram counts and prefix counts both consume
      // this exploded stream — one tokenize pass instead of two
      .cutLineage(eager = false)
    val bgCounts = bigrams.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
    val prefixCounts = bigrams.groupBy(col("lang"), col("w1"))
      .agg(count(lit(1)).as("c_w1"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("p_cond").desc, col("w1"), col("w2"))
    bgCounts.join(prefixCounts, Seq("lang", "w1"))
      .filter(col("c_bg") >= 20)
      .withColumn("p_cond", round(col("c_bg").cast("double") / col("c_w1"), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("lang"), col("w1"), col("w2"), col("c_bg"), col("c_w1"), col("p_cond"), col("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** §2.5#52 — TF-IDF: top-5 terms per language by language-local
    * term frequency × corpus-global inverse document frequency.
    * Three partial-aggregated shuffles (tf by lang×word, df by word,
    * corpus size as a broadcast scalar) joined on the bounded word
    * key — the standard fully-distributed tf-idf layout.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"), explode(tokensCol(col("text"))).as("word"))
    // one shuffle over the exploded stream; tf and df both derive
    // from the compact (word, doc) aggregate (doc determines lang, so
    // (word, doc_id) is unique and df is a plain count). Persisted:
    // it has two consumers, and re-deriving it means re-tokenizing
    // the whole corpus — the one pass that actually costs at 100 TB.
    val perDoc = tok.groupBy(col("word"), col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val tf = perDoc.groupBy(col("lang"), col("word")).agg(sum(col("c")).as("tf"))
    val df = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("lang")).orderBy(col("tfidf").desc, col("word"))
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(n))
      .select(col("lang"), col("word"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy(col("lang"), col("rnk"))
  }

  /** §2.5 `text_lexical_complexity` — per-language lexical
    * complexity profile: mean word length, vowel-group (syllable
    * proxy) rate, long-word (≥7 chars) share, and type-token ratio.
    * Every per-doc component is an exact integer (char counts, token
    * counts, distinct tokens), so per-doc ratios are single IEEE
    * divisions and the only float accumulation is the final per-lang
    * mean — narrow map work, one bounded groupBy, no explode.
    */
  def textLexicalComplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), tokensCol(col("text")).as("toks"),
        length(regexp_replace(trim(lower(col("text"))), "\\s+", ""))
          .cast("long").as("nonspace"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("syl"))
      .select(col("lang"), col("nonspace"), col("syl"),
        size(col("toks")).cast("long").as("w"),
        size(expr("filter(toks, t -> length(t) >= 7)")).cast("long").as("lw"),
        size(array_distinct(col("toks"))).cast("long").as("dw"))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("nonspace").cast("double") / col("w")), 4).as("avg_word_len"),
        round(avg(col("syl").cast("double") / col("w")), 4).as("avg_syl_per_word"),
        round(avg(col("lw").cast("double") / col("w")), 4).as("long_word_ratio"),
        round(avg(col("dw").cast("double") / col("w")), 4).as("type_token_ratio"))
      .orderBy(col("lang"))
  }

  /** §2.5#226 — inverted-index document kNN: top-3 nearest
    * neighbours per document by tf-idf cosine, computed as a sparse
    * posting-list self-join — never a dense all-pairs pass. Postings
    * are df-capped (2 ≤ df ≤ min(n/10, 256)): terms in >10% of the
    * corpus carry ~no idf signal but dominate join cost, and the
    * ABSOLUTE cap is what keeps the self-join linear — Σ df² ≤
    * 256 · Σ df grows with corpus tokens, whereas a relative-only cap
    * lets the heaviest posting lists grow with n and turns the join
    * quadratic. Cosine is taken in the pruned term space
    * (norms over surviving postings), pair dots partial-aggregate on
    * (doc_a, doc_b), and the rank cut keys on the ROUNDED cosine so
    * accumulation-order ulps can't reorder neighbours cross-engine.
    */
  def textTfidfKnn(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
    val perDoc = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("word"))
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("c"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val df = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // three consumers (norms + both join sides) of one tokenize pass
    val postings = perDoc.join(df, Seq("word")).crossJoin(broadcast(n))
      .filter(col("df") >= 2 && col("df") * 10 <= col("n_docs") && col("df") <= 256)
      .select(col("word"), col("doc_id"),
        (col("c") * log(col("n_docs").cast("double") / col("df"))).as("w"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val norms = postings.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = postings.select(col("word"), col("doc_id").as("doc_a"), col("w").as("wa"))
      .join(postings.select(col("word"), col("doc_id").as("doc_b"), col("w").as("wb")),
        Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(sum(col("wa") * col("wb")).as("dot"))
    // eager localCheckpoint: the symmetrize union consumes the scored
    // pair set twice — without it the whole posting join re-executes
    // per branch (and reprints an 80-exchange audit plan)
    val cs = dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cos"))
      .cutLineage()
    val sym = cs.select(col("doc_a").as("doc_id"), col("doc_b").as("nbr_id"), col("cos"))
      .union(cs.select(col("doc_b").as("doc_id"), col("doc_a").as("nbr_id"), col("cos")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("cos").desc, col("nbr_id"))
    sym.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** §2.5#40 — top-5 word bigrams per language: explode n-grams,
    * partial-agg count, rank window per language. The explode is the
    * classic linear fan-out; the shuffle key (lang, bigram) is
    * bounded by vocabulary².
    */
  def textNgramStats(spark: SparkSession, dir: String): DataFrame = {
    // tokenize into a real column first: element_at inside the lambda
    // must hit an attribute, not re-run split() per n-gram element
    // (that inlining is quadratic in document length)
    val bigrams = transform(idxSeq(size(col("toks")) - 1),
      i => concat(element_at(col("toks"), i), lit(" "), element_at(col("toks"), i + 1)))
    val counts = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), tokensCol(col("text")).as("toks"))
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy(col("lang"), col("rnk"))
  }

  /** §2.5#191 — PMI collocation mining: pointwise mutual information
    * `ln(p(ab) / (p(a)·p(b)))` over adjacent word pairs, min count 5,
    * global top-20. Two linear explodes (unigrams, bigrams) each
    * partial-aggregate before their one shuffle; corpus totals and the
    * unigram side of the probability join are broadcast only if small
    * — here the unigram counts join back on each bigram's two words,
    * which at 100 TB is a bounded-vocabulary equi-join, not a data
    * join. Per-row PMI is a single float expression (order-free).
    */
  def textPmi(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(tokensCol(col("text")).as("toks"))
    // unigram counts feed three consumers (both sides of the
    // probability join + the corpus total) and bigram counts two (the
    // pair set + the pair total): persist both compact aggregates so
    // the corpus is tokenized exactly twice (once per n-gram order),
    // never once per consumer
    val uni = docs.select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val pairsOf = transform(idxSeq(size(col("toks")) - 1),
      i => struct(element_at(col("toks"), i).as("wa"),
        element_at(col("toks"), i + 1).as("wb")))
    val biAll = docs.select(explode(pairsOf).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("n_ab"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val bi = biAll.filter(col("n_ab") >= 5)
    val nUni = uni.agg(sum(col("n")).as("n_uni"))
    val nBi = biAll.agg(sum(col("n_ab")).as("n_bi"))
    val a = uni.select(col("word").as("wa"), col("n").as("n_a"))
    val b = uni.select(col("word").as("wb"), col("n").as("n_b"))
    bi.join(a, Seq("wa")).join(b, Seq("wb"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(concat(col("wa"), lit(" "), col("wb")).as("bigram"),
        col("n_ab"), col("n_a"), col("n_b"),
        round(log((col("n_ab").cast("double") / col("n_bi")) /
          ((col("n_a").cast("double") / col("n_uni")) *
            (col("n_b").cast("double") / col("n_uni")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(20)
  }

  /** §2.5#190 — Okapi BM25 retrieval scoring (k1=1.2, b=0.75) for the
    * three highest-df query terms: top-10 docs per term. Same
    * single-shuffle (word, doc) aggregate as [[textTfidf]]; doc
    * length and document frequency both derive from that compact
    * relation, the query-term set and corpus stats are broadcast
    * (3 rows / 1 row), and the rank cut is a per-term window — so the
    * only wide exchange at 100 TB is the tokenize-count shuffle. The
    * per-row score is one float expression (no float aggregation), so
    * engine-order independence is free.
    */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("word"))
    // four consumers (dl, df, the scoring join, corpus totals) hang
    // off this compact aggregate: persist it so the corpus is
    // tokenized exactly once
    val perDoc = tok.groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val dl = perDoc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val tot = dl.agg(sum(col("dl")).as("total_toks"))
    val qterms = df.orderBy(col("df").desc, col("word")).limit(3)
    val avgdl = col("total_toks").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    val w = Window.partitionBy(col("word"))
      .orderBy(col("bm25").desc, col("doc_id"))
    perDoc.join(broadcast(qterms), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(tot))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        round(idf * norm, 6).as("bm25"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .orderBy(col("word"), col("rnk"))
  }

  /** §2.5#321 `text_rerank_sweep` — retrieve-then-rerank evaluation
    * over text, the lexical twin of `ann_rerank_sweep` (and the
    * harness a cross-encoder reranker slots into): each probe
    * document's 3 RAREST terms form a keyword query; BM25 scores only
    * those terms' postings into a shortlist (the cheap retriever);
    * the shortlist — never the corpus — is re-ranked by exact
    * token-set Jaccard against the FULL probe document (the expensive
    * pairwise metric a cross-encoder stands in for: it needs both
    * texts together, so its cost is per shortlist pair — which is the
    * whole point of the two-stage shape). Per shortlist depth the
    * sweep reports the exact-Jaccard mass of the retriever's own
    * top-1 (the depth-invariant baseline) and of the re-ranked top-1
    * (monotone in depth): the uplift IS the reranker's value, so
    * neither column is derivable from the other (the r13 advice on
    * `ann_rerank_sweep`'s degenerate top-1 column, designed out).
    *
    * Engine exactness: per-term BM25 is quantized to a 10⁻⁶-quantum
    * long (the class of `text_bm25`'s round-6 scores) and SUMMED in
    * integers, so shortlist ranking never compares raw float
    * accumulations; Jaccard is an exact-count quotient quantized at
    * 10⁻⁴ (the calibration-op convention) and summed in longs; the
    * only output floats are exact-integer quotients, emitted
    * unrounded.
    *
    * Scale shape: probes are a hard-capped eval slice
    * ([[TextProbeCap]]: ≤60 at any corpus size); each costs 3
    * rare-term postings joins (rare ⇒ short postings), one bounded
    * top-20 window, and ≤20 set-intersection pairs. Nothing is
    * corpus-quadratic.
    */
  /** Probe-slice cap for [[textRerankSweep]]: doc_id % 89 == 7 under
    * this literal id bound is ≤60 probes at ANY corpus size (the
    * `AdcProbeCap` pattern) — the eval slice must not scale with the
    * corpus or its broadcast shortlist would.
    */
  val TextProbeCap: Int = 89 * 60

  def textRerankSweep(spark: SparkSession, dir: String): DataFrame = {
    val depths = Seq(5, 10, 20)
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .cutLineage(eager = false)
    val perDoc = docs.select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .cutLineage(eager = false) // postings read by qterms AND scoring
    val dl = perDoc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tot = dl.agg(sum(col("dl")).as("total_toks"))
    val wRare = Window.partitionBy(col("q_id")).orderBy(col("df"), col("word"))
    val qt = perDoc
      .filter(col("doc_id") % 89 === 7 && col("doc_id") < TextProbeCap)
      .select(col("doc_id").as("q_id"), col("word"))
      .join(df, Seq("word"))
      .withColumn("tr", row_number().over(wRare))
      .filter(col("tr") <= 3)
      .select(col("q_id"), col("word"), col("df"))
    val avgdl = col("total_toks").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    // ≤3 quantized longs per (probe, doc) — integer sums, order-free
    val scored = perDoc.join(broadcast(qt), Seq("word"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(tot))
      .select(col("q_id"), col("doc_id"),
        round(idf * norm * 1000000).cast("long").as("sq"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("sq")).as("bm25q"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25q").desc, col("doc_id"))
    val shortlist = scored
      .withColumn("rnk", row_number().over(wShort).cast("long"))
      .filter(col("rnk") <= depths.max)
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(col("toks"))).as("ts"))
    val qsets = sets
      .filter(col("doc_id") % 89 === 7 && col("doc_id") < TextProbeCap)
      .select(col("doc_id").as("q_id"), col("ts").as("qs"))
    val pairs = sets.join(broadcast(shortlist), Seq("doc_id"))
      .join(broadcast(qsets), Seq("q_id"))
      .select(col("q_id"), col("doc_id"), col("rnk"),
        when(size(array_distinct(concat(col("qs"), col("ts")))) > 0,
          round(size(array_intersect(col("qs"), col("ts"))).cast("double") /
            size(array_distinct(concat(col("qs"), col("ts")))).cast("double")
            * 10000).cast("long"))
          .otherwise(lit(10000L)).as("jacq"))
      .cutLineage() // read by the baseline row AND every depth slice
    val wRr = Window.partitionBy(col("depth"), col("q_id"))
      .orderBy(col("jacq").desc, col("doc_id"))
    val rerank = pairs
      .withColumn("depth", explode(array(depths.map(d => lit(d.toLong)): _*)))
      .filter(col("rnk") <= col("depth"))
      .withColumn("rr", row_number().over(wRr))
      .filter(col("rr") === 1)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("jacq")).as("rerank_top1_jacq"))
    val baseline = pairs.filter(col("rnk") === 1)
      .agg(sum(col("jacq")).as("bm25_top1_jacq"))
    rerank.crossJoin(broadcast(baseline))
      .select(col("depth"), col("n_queries"),
        col("bm25_top1_jacq"), col("rerank_top1_jacq"),
        (col("bm25_top1_jacq").cast("double") / col("n_queries") / 10000.0)
          .as("mean_bm25_top1"),
        (col("rerank_top1_jacq").cast("double") / col("n_queries") / 10000.0)
          .as("mean_rerank_top1"))
      .orderBy(col("depth"))
  }

  /** §2.5#269 — hapax-legomena profile per language: the share of
    * vocabulary seen exactly once. A high hapax ratio flags noisy or
    * OCR-corrupted slices; a collapsing one flags template spam —
    * standard corpus QA before training. Shape: explode → (lang,
    * token) counts reduce map-side → the per-lang rollup is a second
    * tiny HashAggregate. Both levels stay in codegen; the output is
    * the bounded language axis.
    */
  def textHapaxRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(tokensCol(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("n")).as("n_tokens"))
      .select(col("lang"), col("vocab_size"), col("n_hapax"), col("n_tokens"),
        // exact-count quotient, emitted unrounded (tie-attractor rule)
        (col("n_hapax").cast("double") / col("vocab_size"))
          .as("hapax_ratio"))
      .orderBy(col("lang"))

  /** §2.5 `text_ngram_novelty` — first-occurrence 5-gram novelty per
    * language: of each language's distinct (doc, shingle) instances,
    * what share is the shingle's first appearance in the whole corpus
    * (by doc_id order)? Low novelty = the language slice is
    * boilerplate recycled from earlier documents — the freshness gate
    * a training-data mixture applies before weighting a slice up.
    *
    * Shape: linear shingle explode → one distinct on (doc, shingle)
    * → ONE shuffle on the shingle key where min_by picks the first
    * document's language (doc_ids are unique, so the argmin is
    * deterministic) → bounded per-lang rollup. No join-back of the
    * pair set and nothing pairwise; the novelty rate is an
    * exact-count quotient, emitted unrounded (tie-attractor rule).
    */
  def textNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = transform(idxSeq(size(col("toks")) - 4),
      i => concat_ws(" ", element_at(col("toks"), i),
        element_at(col("toks"), i + 1), element_at(col("toks"), i + 2),
        element_at(col("toks"), i + 3), element_at(col("toks"), i + 4)))
    val pairs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"), tokensCol(col("text")).as("toks"))
      .select(col("lang"), col("doc_id"), explode(grams).as("g"))
      .distinct()
      .cutLineage(eager = false) // one scan feeds both reductions
    val totals = pairs.groupBy(col("lang")).agg(count(lit(1)).as("n_shingles"))
    val novel = pairs.groupBy(col("g"))
      .agg(min_by(col("lang"), col("doc_id")).as("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq("lang"), "left")
      .select(col("lang"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_shingles"))
          .as("novelty_rate"))
      .orderBy(col("lang"))
  }

  /** §2.5#330 `text_readability` — per-language Flesch-style reading
    * ease over the corpus totals: 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    * with W = tokens, S = sentence-punctuation clusters, Y =
    * vowel-group syllable proxies, all exact per-document integer
    * counts summed per language. The ease chain is correctly-rounded
    * IEEE ops over exact longs and shared decimal literals, mirrored
    * op-for-op in the oracle — emitted unrounded (tie rule). The
    * greatest(·,1) guards make the quotients total without changing
    * any populated language's value.
    *
    * Scale: narrow per-row regex counts (codegen pass, no explode),
    * one bounded groupBy on the language axis.
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"),
        size(tokensCol(col("text"))).cast("long").as("w"),
        size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
          .cast("long").as("s"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("y"))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
        sum(col("s")).as("sentences"), sum(col("y")).as("syllables"))
      .select(col("lang"), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        (lit(206.835) -
          lit(1.015) * (col("words").cast("double") /
            greatest(col("sentences"), lit(1L)).cast("double")) -
          lit(84.6) * (col("syllables").cast("double") /
            greatest(col("words"), lit(1L)).cast("double")))
          .as("reading_ease"))
      .orderBy(col("lang"))
  }
}
