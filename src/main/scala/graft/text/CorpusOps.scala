package graft.text

import graft.Ckpt.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-pipeline operators (SURVEY.md §2.5/§2.3 additions): the
  * dataset-preparation steps a pretraining pipeline runs after
  * filtering/dedup — sequence packing, benchmark-contamination
  * checks, domain-mixture weighting, and URL canonicalization.
  *
  * Everything is integer/boolean arithmetic end-to-end (no float
  * rounding anywhere), so the DuckDB oracle compare is bit-exact by
  * construction.
  */
object CorpusOps {

  /** Tokens per document, shared tokenizer with TextAnalysis. */
  private def toks = TextAnalysis.tokensCol(col("text"))

  /** §2.5#122 — concat-and-chunk sequence packing: the standard
    * pretraining layout (concatenate documents in deterministic
    * order, slice into fixed `seqLen`-token training sequences).
    * Documents are packed independently per (lang, shard) stream —
    * shard is a deterministic doc_id bucket, so parallelism scales
    * with `nShards` and no stream ever needs a global order. Each doc
    * gets its token start offset (running sum via a ROWS window) and
    * the first/last sequence index it lands in; a doc straddling a
    * boundary spans >1 sequence. One shuffle on the (lang, shard)
    * key; at 100 TB the packing never materializes the concatenated
    * stream — offsets are enough for the downstream tensor writer.
    */
  def textPackChunks(spark: SparkSession, dir: String,
      seqLen: Int = 512, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("lang"), (col("doc_id") % nShards).as("shard"),
        col("doc_id"), size(toks).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"start_off div $seqLen"))
      .withColumn("seq_last", expr(s"(start_off + n_tokens - 1) div $seqLen"))
      .withColumn("n_seqs_spanned", col("seq_last") - col("seq_first") + 1)
      .orderBy(col("lang"), col("shard"), col("doc_id"))
  }

  /** §2.5#304 — overlapping chunking (RAG/eval windows): each
    * document slices into fixed-length token chunks on a fixed
    * stride (chunkLen 128, stride 96 → 32-token overlap), each chunk
    * carrying its offsets and an md5 content address so downstream
    * chunk-level dedup/retrieval is a plain equi-join. Unlike
    * [[textPackChunks]] (which concatenates documents into training
    * sequences), chunks never cross document boundaries and
    * neighbors overlap so no sentence is ever split away from its
    * context. Purely narrow work: a per-row index explode bounded by
    * ⌈n/stride⌉ and one md5 per chunk — no shuffle at all until a
    * consumer aggregates; at 100 TB this runs inside the scan.
    */
  def corpusChunkOverlap(spark: SparkSession, dir: String,
      chunkLen: Int = 128, stride: Int = 96): DataFrame = {
    require(stride <= chunkLen, "stride beyond chunkLen would skip tokens")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .withColumn("n", size(col("tk")))
    // chunk count: 1 + ceil((n - chunkLen) / stride) when the doc
    // overflows one chunk (integer ceil; the last chunk may be short)
    docs
      .withColumn("n_chunks",
        expr(s"1 + (CASE WHEN n > $chunkLen THEN (n - $chunkLen + ${stride - 1}) div $stride ELSE 0 END)"))
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("ci"))
      .select(col("doc_id"),
        col("ci").cast("long").as("chunk_idx"),
        (col("ci") * stride).cast("long").as("start_tok"),
        (least(col("ci") * stride + chunkLen, col("n")) - col("ci") * stride)
          .cast("long").as("n_tok_chunk"),
        md5(array_join(slice(col("tk"), col("ci") * stride + 1,
          least(col("ci") * stride + chunkLen, col("n")) - col("ci") * stride), " "))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** §2.5#123 — benchmark-contamination check: flag corpus documents
    * sharing any 8-token span with a held-out "benchmark" set (the
    * deterministic doc_id % 97 slice stands in for an eval suite).
    * The benchmark span set is tiny and distinct → broadcast; corpus
    * docs contribute their distinct spans once (array_distinct before
    * explode), so the probe is linear in corpus tokens and the only
    * shuffle is the per-doc hit count. This is the n-gram-overlap
    * decontamination step (GPT-3/Gopher style) every training set
    * needs before eval.
    *
    * Spans are distinct md5 hashes via the fused native
    * [[graft.functions.NGramSpanHashes]] — one tokenize+hash pass per
    * document (the portable transform/element_at form re-ran the
    * tokenizer per span element once the inferred `size(spans) > 0`
    * filter inlined it: ~750 tokenizations/doc, 75 s at sf0.1), and
    * the exploded probe keys are fixed-width 32-char hashes instead
    * of 8-token strings, shrinking the broadcast and the hit-count
    * shuffle. The oracle mirrors md5 on the same span text.
    */
  def textContamination(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.ngram_span_hashes(toks, n).as("spans"))
    val benchSpans = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("spans")).as("span")).distinct()
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val hits = corpus.select(col("doc_id"), explode(col("spans")).as("span"))
      .join(broadcast(benchSpans), "span")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam_spans"))
    corpus.select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_contam_spans"), lit(0L)).as("n_contam_spans"))
      .withColumn("contaminated", col("n_contam_spans") > 0)
      .orderBy(col("doc_id"))
  }

  /** §2.5#124 — domain-mixture sampling weights: per (lang, source)
    * cell, the up/down-sampling weight that moves the realized
    * mixture to a uniform target over cells. Weights are exact
    * integer parts-per-million ((1e6 · total) div (cells · cell
    * size)) — float division rounds differently across engines, ppm
    * floor-division cannot. Two bounded aggregations plus a broadcast
    * of the 1-row totals; nothing here grows with corpus size except
    * the first partial-agg scan.
    */
  def corpusMixture(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("lang"), col("source"), size(toks).cast("long").as("n_toks"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val totals = cells.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("n_cells"))
    cells.crossJoin(broadcast(totals))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_docs) div n_total").as("share_ppm"),
        expr("(1000000 * n_total) div (n_cells * n_docs)").as("weight_ppm"))
      .orderBy(col("lang"), col("source"))
  }

  /** The deterministic URL each document would carry in a crawled
    * corpus (derived from source + doc_id, same convention as the
    * sync domain's event-derived inventory): protocol, WWW-prefix,
    * query-string, fragment, and trailing-slash variants all appear
    * so normalization has real work to do.
    */
  def urlCol: org.apache.spark.sql.Column =
    concat(
      when(col("doc_id") % 4 === 0, lit("http://")).otherwise(lit("HTTPS://")),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".example.com/docs/"),
      (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 3 === 0, lit("?utm_source=feed"))
        .when(col("doc_id") % 3 === 1, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("#top")).otherwise(lit("")))

  /** §2.3#125 — URL canonicalization dedup: normalize each document's
    * URL (case-fold, strip scheme/www/query/fragment/trailing slash)
    * and collapse to canonical clusters — the crawl-frontier dedup
    * every web corpus applies before content dedup. Narrow codegen
    * normalization, one hash shuffle on the canonical key.
    */
  def dedupUrlNorm(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(urlCol), "^https?://", ""), "^www\\.", ""), "[?#].*$", ""), "/$", "")
    Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("norm_url"))
      .groupBy(col("norm_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy(col("norm_url"))
  }

  /** §2.5#192 — DSIR-style data selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * score every document by how much its hashed-n-gram feature
    * distribution looks like a target domain vs the raw corpus, then
    * keep the top of the ranking. Features are unigrams hashed into
    * 256 buckets (md5 — engine-portable); target = the English
    * subset, raw = everything; each bucket carries an add-1-smoothed
    * log-likelihood ratio quantized to integer micro-nats, so the
    * per-document score is an exact BIGINT dot product —
    * order-independent under any partitioning, no float-sum drift.
    * Scale shape: the bucket/ratio table is 256 broadcast rows, the
    * only wide exchange is the tokenize-count shuffle, and the top-50
    * cut is TakeOrderedAndProject (never a global sort).
    */
  def corpusDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("word")), 1, 15), 16, 10)
      .cast("long") % 256
    // the tokenize-explode shuffle is the only expensive pass: persist
    // its compact (doc, bucket) aggregate so the ratio estimation and
    // the scoring join both reuse it instead of re-tokenizing (pdb is
    // ~|docs|×occupied-buckets rows — tiny next to the token stream)
    val pdb = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), explode(toks).as("word"))
      .withColumn("bucket", bucket)
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    // raw and target bucket counts in ONE pass; corpus totals fold
    // from the 256-row bucket table, not from another data scan
    val bstats = pdb.groupBy(col("bucket"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
    val totals = bstats.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val lr = bstats
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(((col("ct") + lit(1.0)) / (col("tt") + lit(256.0))) /
          ((col("cr") + lit(1.0)) / (col("tr") + lit(256.0)))) * lit(1000000.0))
          .cast("long").as("lr_micro"))
    pdb.join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_toks"),
        sum(col("c") * col("lr_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(50)
  }

  /** §2.5 `corpus_lang_weights` — mixture rebalancing weights: per
    * language, the sampling weight that moves the corpus toward a
    * uniform language mixture, capped at 3× upsampling (unbounded
    * upsampling of a rare slice just replays the same documents —
    * the cap is the standard guard). weight = min(3, target/actual
    * share); expected_docs = the post-resampling document count. One
    * bounded aggregation plus scalar arithmetic — the plan for the
    * sampler that then runs as one hash-filter pass over 100 TB.
    */
  def corpusLangWeights(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("total"),
      count(lit(1)).as("n_langs"))
    counts.crossJoin(broadcast(tot))
      // share and weight are short deterministic float chains over
      // exact integers (each step correctly rounded on both engines)
      // → emitted unrounded per the tie-attractor rule. The round()
      // inside expected_docs is scale-0: a .5 tie there is binary-
      // exact, where both engines agree — not the attractor class.
      .withColumn("share", col("n_docs").cast("double") / col("total"))
      .withColumn("weight",
        least(lit(3.0), (lit(1.0) / col("n_langs")) / col("share")))
      .select(col("lang"), col("n_docs"), col("share"),
        col("weight"),
        round(col("n_docs") * col("weight")).cast("long").as("expected_docs"))
      .orderBy(col("lang"))
  }

  /** §2.5#273 — token-budget selection: greedily take the
    * highest-quality documents (same composite score as
    * `text_quality`, scaled to an exact integer) until the running
    * token total reaches 60% of the corpus — the "best N tokens"
    * cut every pretraining data run makes. The global quality order
    * is distributed via [[graft.analytics.Ranks.globalRankCumSum]]:
    * the score is bounded in [0, 10000], so banding it into 21 cells
    * gives per-band count/sum offsets over a tiny axis while each
    * band sorts in parallel — no single-task sort at any corpus
    * size. The budget and per-language totals are broadcast scalars.
    * Output: per-language selected-vs-total docs and token share.
    */
  def corpusTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val nToks = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val q = round((lit(1.0) - stopHits / nToks) * least(lit(1.0), nToks / 50.0), 4)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_toks"),
        round(q * 10000).cast("long").as("qs"))
    // 60% budget in exact integer math (identical in both engines)
    val budget = scored.agg(sum(col("n_toks")).as("tt"))
      .selectExpr("(tt * 6) div 10 AS budget")
    val ranked = graft.analytics.Ranks.globalRankCumSum(scored,
      expr("(10000 - qs) div 500"), Seq(col("qs").desc, col("doc_id")),
      col("n_toks"), "sel_rank", "cum_toks")
    val selected = ranked.crossJoin(broadcast(budget))
      // greedy prefix: a doc is taken while the total BEFORE it is
      // still under budget (so the cut doc that crosses is included)
      .filter(col("cum_toks") - col("n_toks") < col("budget"))
    val langTotals = scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("lang_toks"))
    selected.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"), sum(col("n_toks")).as("toks_selected"))
      .join(broadcast(langTotals), Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_selected"),
        col("lang_toks"), col("toks_selected"),
        // exact-long quotient, emitted unrounded (tie-attractor rule)
        (col("toks_selected").cast("double") / col("lang_toks"))
          .as("tok_share"))
      .orderBy(col("lang"))
  }

  /** §2.5#332 `corpus_curriculum_order` — curriculum schedule over
    * the token-budget selection: the docs that survive the 60% budget
    * cut (IDENTICAL greedy-by-quality prefix as [[corpusTokenBudget]])
    * are ordered easiest→hardest by per-document Flesch reading ease
    * and split into `phases` equal-count curriculum phases — the
    * easy-first ordering a curriculum-learning run feeds its sampler.
    * Output per phase: doc/token mass, the ease range it spans, and
    * mean quality (easier phases should not be quality-degenerate —
    * that is the diagnostic this table exists to show).
    *
    * Exactness: the per-doc sort key is integer milli-ease in one
    * truncated quotient, ease_m = (206835·s·w − 1015·w² − 84600·y·s)
    * div (s·w) — Spark `div` and DuckDB `//` both truncate toward
    * zero (verified r15), so the global curriculum ORDER is
    * bit-identical across engines with no float anywhere in a sort
    * key. Phases come from the exact ntile arithmetic
    * ([[graft.analytics.Ranks.ntileFromRank]] ≡ SQL `ntile`).
    *
    * Scale: the quality prefix and the curriculum rank are BOTH
    * banded global ranks (the [[graft.analytics.Ranks]] spine — no
    * single-task sort at any corpus size); the ease band axis is the
    * bounded statistic range (~25 cells of 50 milli-ease units,
    * clamped), everything after reduces to the `phases`-row grid.
    */
  def corpusCurriculumOrder(spark: SparkSession, dir: String,
      phases: Int = 5): DataFrame = {
    val nToks = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val q = round((lit(1.0) - stopHits / nToks) * least(lit(1.0), nToks / 50.0), 4)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_toks"),
        round(q * 10000).cast("long").as("qs"),
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long").as("s"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("y"))
      // integer milli-ease; greatest(s,1) totalizes sentence-free docs
      // without moving any populated one (w ≥ 1: the tokenizer never
      // returns an empty array, same premise corpusTokenBudget's
      // stopword quotient already stands on)
      .withColumn("ease_m", expr(
        """(206835 * greatest(s, 1) * n_toks - 1015 * n_toks * n_toks
          |  - 84600 * y * greatest(s, 1)) div (greatest(s, 1) * n_toks)"""
          .stripMargin))
    val budget = scored.agg(sum(col("n_toks")).as("tt"))
      .selectExpr("(tt * 6) div 10 AS budget")
    val ranked = graft.analytics.Ranks.globalRankCumSum(scored,
      expr("(10000 - qs) div 500"), Seq(col("qs").desc, col("doc_id")),
      col("n_toks"), "sel_rank", "cum_toks")
    val selected = ranked.crossJoin(broadcast(budget))
      .filter(col("cum_toks") - col("n_toks") < col("budget"))
      .select(col("doc_id"), col("n_toks"), col("qs"), col("ease_m"))
    // easiest first: band must be non-decreasing along (ease_m DESC);
    // ease_m ≤ 206835 < 207000 so the band index is always ≥ 0, and
    // the clamp only merges the pathological ultra-hard tail into one
    // band (within-band order still sorts them exactly)
    val phased = graft.analytics.Ranks.ntileBanded(selected,
      expr("least((207000 - ease_m) div 50000, 40)"),
      Seq(col("ease_m").desc, col("doc_id")), phases, "phase")
    phased.groupBy(col("phase").cast("long").as("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("phase_toks"),
        max(col("ease_m")).as("ease_hi"), min(col("ease_m")).as("ease_lo"),
        sum(col("qs")).as("qs_sum"))
      .select(col("phase"), col("n_docs"), col("phase_toks"),
        col("ease_hi"), col("ease_lo"),
        // exact-long quotient chain, emitted unrounded (tie rule)
        (col("qs_sum").cast("double") / col("n_docs") / 10000.0)
          .as("mean_quality"))
      .orderBy(col("phase"))
  }

  /** Top-`k` character-pair merges by corpus frequency (ties broken
    * on the pair string) — the data-derived merges table the BPE
    * apply broadcasts. Bounded by the LITERAL k at any corpus size;
    * one pair-keyed shuffle with map-side combine builds it.
    */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(toks).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p"))
      .limit(k)

  /** §2.5 `text_bpe_tokens` — tokenizer-aware token accounting: every
    * other token op counts whitespace words, but real training
    * budgets are counted in SUBWORD tokens. This is the vocab-apply
    * step of a pair-merge BPE (one merge-rank class): the corpus-
    * derived top-256 pair merges broadcast as one array row, and a
    * narrow native kernel ([[graft.functions.BpeTokenCount]]) splits
    * each word between exactly the adjacent character pairs NOT in
    * the merges table — pieces(word) = 1 + non-merged pairs, a closed
    * form both engines can replay (a greedy longest-match loop is
    * sequential per word; pair-connectivity splitting is one scan).
    * Per doc: whitespace tokens, token characters, BPE tokens, and
    * integer-ppm pieces-per-word (the budget conversion factor).
    */
  def textBpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir).agg(collect_list(col("p")).as("merges"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .crossJoin(broadcast(merges))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_ws_tokens"),
        aggregate(transform(col("tk"), w => length(w)), lit(0L),
          (a, x) => a + x).as("n_tok_chars"),
        graft.functions.TextFunctions.bpe_token_count(col("tk"), col("merges"))
          .as("n_bpe_tokens"))
      .withColumn("pieces_per_word_ppm",
        expr("(1000000 * n_bpe_tokens) div n_ws_tokens"))
      .orderBy(col("doc_id"))
  }

  /** §2.5 `corpus_token_budget_bpe` — [[corpusTokenBudget]] re-based
    * on SUBWORD counts: the greedy quality-ranked 60% budget is
    * selected and accounted in BPE tokens (how a real pretraining
    * budget is denominated), while the quality score keeps its
    * whitespace-token definition so the two budget variants rank
    * documents identically and differ ONLY in the accounting axis.
    * The whitespace variant stays registered for the oracle lineage.
    */
  def corpusTokenBudgetBpe(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir).agg(collect_list(col("p")).as("merges"))
    val nToks = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t === "the" || t === "a")).cast("double")
    val q = round((lit(1.0) - stopHits / nToks) * least(lit(1.0), nToks / 50.0), 4)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), toks.as("tk"),
        round(q * 10000).cast("long").as("qs"))
      .crossJoin(broadcast(merges))
      .select(col("doc_id"), col("lang"), col("qs"),
        graft.functions.TextFunctions.bpe_token_count(col("tk"), col("merges"))
          .as("n_toks"))
    val budget = scored.agg(sum(col("n_toks")).as("tt"))
      .selectExpr("(tt * 6) div 10 AS budget")
    val ranked = graft.analytics.Ranks.globalRankCumSum(scored,
      expr("(10000 - qs) div 500"), Seq(col("qs").desc, col("doc_id")),
      col("n_toks"), "sel_rank", "cum_toks")
    val selected = ranked.crossJoin(broadcast(budget))
      .filter(col("cum_toks") - col("n_toks") < col("budget"))
    val langTotals = scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("lang_toks"))
    selected.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"), sum(col("n_toks")).as("toks_selected"))
      .join(broadcast(langTotals), Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_selected"),
        col("lang_toks"), col("toks_selected"),
        // exact-long quotient, emitted unrounded (tie-attractor rule)
        (col("toks_selected").cast("double") / col("lang_toks"))
          .as("tok_share"))
      .orderBy(col("lang"))
  }

  /** §2.5#294 — cross-source content-overlap matrix: for every source
    * pair, how many distinct word-3-gram shingles they share, and the
    * Jaccard of their shingle vocabularies. This is the corpus-
    * assembly readout that decides which sources to dedup AGAINST
    * each other first (two crawls of the same sites overlap heavily;
    * an overlap near zero means cross-source dedup there is wasted
    * work) — complementary to `text_contamination` (doc vs benchmark)
    * and `corpus_near_dup_by_source` (within-cluster provenance).
    *
    * Scale shape: ONE shingle-keyed shuffle — `collect_set(source)`
    * per shingle with map-side partials (per-key set size is bounded
    * by the SOURCE axis, a catalog-scale constant, so the state never
    * grows with the corpus) — then every readout is a bounded explode
    * of that set: per-source vocabulary counts, and ≤ C(|sources|,2)
    * ordered pairs per shingle for the shared counts. The first
    * formulation here (distinct + shingle self-join) measured 27 s at
    * sf1 from shuffling shingle strings twice; this one-shuffle form
    * is ~4× faster with identical output. The pair grid itself is
    * C(|sources|,2) — driver-safe and broadcast for the zero-overlap
    * completion row.
    */
  def corpusSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val bySh = Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("source"),
        explode(graft.dedup.Dedup.shinglesOf(toks)).as("sh"))
      .groupBy(col("sh"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
    val vocab = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    // ordered pairs within each shingle's (sorted) source set:
    // a < b by construction, <= C(|sources|,2) structs per shingle
    val shared = bySh.filter(size(col("srcs")) > 1)
      .select(explode(flatten(transform(col("srcs"), (x, i) =>
        transform(
          slice(col("srcs"), i + lit(2), size(col("srcs")) - i - 1),
          y => struct(x.as("source_a"), y.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // complete grid (bounded |sources|²): pairs with zero overlap are
    // part of the answer, not an absence
    val grid = vocab.select(col("source").as("source_a"), col("n_sh").as("sh_a"))
      .crossJoin(broadcast(
        vocab.select(col("source").as("source_b"), col("n_sh").as("sh_b"))))
      .filter(col("source_a") < col("source_b"))
    grid.join(shared, Seq("source_a", "source_b"), "left_outer")
      .select(col("source_a"), col("source_b"),
        col("sh_a"), col("sh_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        // exact-count Jaccard quotient, emitted unrounded
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("sh_a") + col("sh_b") - coalesce(col("n_shared"), lit(0L))))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
