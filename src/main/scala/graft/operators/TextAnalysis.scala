package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text analysis over the `documents` corpus: language-ID, quality
  * scoring, token counting, and rolling-hash fingerprinting — the
  * row-local preprocessing stages of a training-data pipeline.
  *
  * Every operator is a pure per-row expression (no shuffle, no UDF):
  * at 100 TB these run at scan speed inside WholeStageCodegen, and the
  * scan reads only the `doc_id`/`text` columns (column pruning).
  */
object TextAnalysis {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.table(s, d, name)

  private val enStop = Seq("the", "a", "of", "and", "in", "to", "is")
  private val esStop = Seq("el", "la", "de", "y", "los", "que", "un")
  private val zhStop = Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3")

  private def stopHits(tok: Column, words: Seq[String]): Column =
    size(filter(tok, w => w.isin(words.map(x => x: Any): _*)))

  /** Language-ID by stopword voting with a deterministic tiebreak order
    * (en > es > zh). An n-gram character model is the richer public
    * approach; stopword voting is the portable, shuffle-free core.
    */
  def langId(docs: DataFrame): DataFrame = {
    docs
      // tokenization materialized once; the three stopword filters then
      // read the attribute instead of re-splitting per language
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), col("lang"),
        stopHits(col("tok"), enStop).as("en_hits"),
        stopHits(col("tok"), esStop).as("es_hits"),
        stopHits(col("tok"), zhStop).as("zh_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("zh_hits"), "en")
          .when(col("es_hits") >= col("zh_hits"), "es")
          .otherwise("zh"))
      .withColumn("is_match", col("pred_lang") === col("lang"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * word length, folded into one bounded score. All ratios are exact
    * integer counts divided as doubles — deterministic on any engine.
    */
  def quality(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(col("tok")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long").as("punct_chars"),
        stopHits(col("tok"), enStop).cast("long").as("stop_hits"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("word_chars"))
      // empty text would divide by zero under ANSI mode; score it 0
      .withColumn("punct_ratio",
        when(col("n_chars_m") > 0,
          col("punct_chars").cast("double") / col("n_chars_m")).otherwise(0.0))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("avg_word_len", col("word_chars").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.4 +
        col("stop_ratio") * 0.3 +
        (lit(1.0) - col("punct_ratio")) * 0.3)
  }

  /** Token counting: whitespace tokens, a BPE-ish regex token count
    * (letter runs / digit runs / single symbols), and the chars/4
    * heuristic LLM pipelines use for budget estimates.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("re_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("est_tokens"))

  /** Rolling polynomial fingerprint: fold (acc*31 + codepoint) mod 1e9+7
    * over the characters. The left fold is order-defined, so the value is
    * engine-reproducible; the mod keeps it in 30 bits.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(
        """aggregate(
          |  filter(split(text, ''), c -> c <> ''),
          |  cast(0 as bigint),
          |  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""".stripMargin).as("fingerprint"))
      .withColumn("shard", col("fingerprint") % 1024)

  /** Normalization pipeline: lowercase → strip non-alphanumerics →
    * collapse whitespace → drop stopwords. The canonical pre-tokenization
    * cleanup pass; pure per-row string expressions.
    */
  def normalize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        split(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " "), " ").as("tok"))
      // filtered tokens materialized once; both outputs read the attribute
      .select(col("doc_id"),
        filter(col("tok"),
          w => !w.isin((enStop :+ "").map(x => x: Any): _*)).as("kept"))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("normalized"),
        size(col("kept")).cast("long").as("n_kept"))

  /** TF-IDF weights per (document, term) — the classic corpus-statistics
    * join: term frequencies shuffle on (doc, term), document frequencies
    * on term, and the corpus size rides along as a broadcast scalar (no
    * driver-side count action). ln() outputs are pinned to 8 decimals so
    * the value is libm-implementation-independent for the oracle.
    *
    * The df join is UNHINTED: df is vocabulary-sized — unbounded at
    * corpus scale, the same class the round-4 verdict flagged on
    * g5/c11 — so AQE broadcasts while it fits and shuffle-joins on the
    * term key (tf's existing partitioning) past the threshold. Only
    * the 1-row corpus count keeps its hint.
    */
  def tfIdf(docs: DataFrame): DataFrame = {
    // text guard + _outer: split never yields an empty array, so the
    // row set is identical — and no inferred size>0 filter re-splits
    // the corpus inside the scan (§6b round-15)
    val terms = Dedup.spread(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), explode_outer(col("tok")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", round(log((col("n_docs") + 1.0) / (col("df") + 1.0)), 8))
      .withColumn("tfidf", round(col("tf") * col("idf"), 8))
      .select("doc_id", "term", "tf", "df", "idf", "tfidf")
  }

  /** Repetition scoring (Gopher-style quality signals): duplicate-token
    * ratio and the fraction of all bigrams taken by the single most
    * frequent bigram — the standard detectors for looping/boilerplate
    * text. Per-doc token stats are row-local; the bigram mode needs two
    * keyed aggregations ((doc, gram) counts, then per-doc max/sum) — both
    * map-side-combined, shuffling only counted grams, never raw text.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = Dedup.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), col("tok"),
        size(col("tok")).cast("long").as("n_tokens"),
        size(array_distinct(col("tok"))).cast("long").as("n_distinct"))
    // _outer: non-empty under the n_tokens >= 2 guard; a plain explode's
    // inferred filter re-runs the bigram build in the scan (§6b round-15)
    val gramStats = toks.filter(col("n_tokens") >= 2)
      .select(col("doc_id"), explode_outer(
        transform(sequence(lit(0), size(col("tok")) - 2), i =>
          concat_ws(" ", element_at(col("tok"), i + 1), element_at(col("tok"), i + 2)))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_gram_count"), sum(col("c")).as("n_grams"))
    toks.select("doc_id", "n_tokens", "n_distinct")
      .withColumn("dup_token_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
      .join(gramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("dup_token_ratio"),
        coalesce(col("top_gram_count"), lit(0L)).as("top_gram_count"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
      .withColumn("top_gram_frac",
        when(col("n_grams") > 0,
          col("top_gram_count").cast("double") / col("n_grams")).otherwise(0.0))
      .withColumn("is_repetitive",
        col("dup_token_ratio") > 0.8 || col("top_gram_frac") > 0.1)
  }

  private val emailRe = "[A-Za-z0-9]+@[A-Za-z0-9]+\\.[A-Za-z]+"
  private val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val phoneRe = "555-[0-9]{4}"

  /** PII detection + redaction. The corpus is synthetic word-soup with no
    * real PII, so each row first gets a deterministic PII suffix derived
    * from its own columns (email from `source`, IP and phone from
    * `doc_id`) — the detect/redact regexes are then genuinely exercised
    * and oracle-checkable. The regex subset (character classes, counted
    * repetition, literals) parses identically under Java regex and
    * DuckDB's RE2. Row-local, scan-speed, no shuffle.
    */
  def piiRedact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        concat(col("text"), lit(" contact "), col("source"), lit("@example.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 call 555-"),
          (lit(1000) + col("doc_id") % 9000).cast("string")).as("pii_text"))
      .select(col("doc_id"),
        regexp_count(col("pii_text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("pii_text"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_count(col("pii_text"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
            ipRe, "<IP>"),
          phoneRe, "<PHONE>").as("redacted"))

  /** F9: unigram log-probability scoring — the core of CCNet-style
    * perplexity filtering: each token scored by the corpus's own
    * smoothed unigram distribution, per-doc mean log-prob; the lowest
    * tail is the gibberish/boilerplate cut. Same keyed shape as TF-IDF
    * (term counts shuffle on term, corpus totals broadcast as one row).
    * The per-doc mean sums ROUNDED log-probs through decimal so the
    * reduction is associative — bit-identical across partitionings and
    * engines (SURVEY §6b FP-parity rule). The vocab join is UNHINTED
    * (vocabulary-sized = unbounded at corpus scale): AQE broadcasts
    * while lp fits and falls back to a term-keyed shuffle join beyond
    * the threshold — no code change needed at 100 TB (a top-K vocab
    * with a default tail log-prob remains the bandwidth optimization).
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    // text guard + _outer: identical rows, no scan-side re-split (§6b round-15)
    val terms = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("term"))
    val tc = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = tc.agg(sum(col("c")).as("total"), count(lit(1)).as("vocab"))
    val lp = tc.crossJoin(broadcast(tot))
      .withColumn("logp",
        round(log((col("c") + 1.0) / (col("total") + col("vocab"))), 8))
    terms.join(lp.select(col("term"), col("logp")), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("logp").cast("decimal(18,8)")).cast("double") / count(lit(1)))
          .as("mean_logprob"))
  }

  /** F13: per-doc Shannon token entropy — the information-density
    * quality signal (boilerplate and keyword-stuffed docs score low,
    * looping text scores near zero; Gopher's diversity family). The
    * identity H = ln(n) − (Σ c·ln c)/n needs only the (doc, term)
    * count table — one keyed aggregate after the f6-shaped term
    * shuffle, no per-token ln. Portability: each ln is pinned to 8 dp
    * (libm-parity, §6b) and enters the sum as DECIMAL(18,8) × integer
    * count — the cross-term sum is decimal-exact, so per-doc results
    * don't depend on aggregation order (cluster-size-independent).
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    // text guard + _outer: identical rows, no scan-side re-split (§6b round-15)
    val terms = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        // the count multiplier is cast to DECIMAL(10,0), NOT left as
        // long: decimal(18,8) × decimal(20,0)-widened-long needs
        // precision 39 > 38, and Spark's ANSI adjusted-scale rule then
        // silently TRUNCATES the scale to 7 — a 2.5e-7 systematic error
        // vs DuckDB's exact (38,8). (10,0) keeps the product at (29,8).
        sum(round(log(col("c")), 8).cast("decimal(18,8)")
          * col("c").cast("decimal(10,0)")).as("sclnc"))
      // NO terminal round: ln(n)8 − (exact decimal)/n is a composition
      // of identical IEEE ops on identical inputs → bit-identical in
      // both engines (f9's shape). A final round(…,8) here is actively
      // UNSAFE: the exact value can land on a true 8dp tie that is not
      // binary-representable (measured: n=16 → H = 2.599301925 exactly;
      // Spark rounds its shortest-decimal repr up, DuckDB rounds the
      // binary double down) — §6b.
      .select(col("doc_id"), col("n_tokens"),
        (round(log(col("n_tokens")), 8) -
          col("sclnc").cast("double") / col("n_tokens")).as("entropy"))
  }

  /** F14: per-source KL divergence from the corpus unigram distribution
    * — the domain-shift monitor ("which source's language looks least
    * like the mixture"), the statistic behind mixture re-weighting
    * decisions. KL(p_s‖q) expands to (1/n_s)·Σ c_st·(ln c_st − ln n_s −
    * ln c_t + ln n): every ln is pinned to 8 dp and the bracket is
    * assembled in DECIMAL so the Σ is exact integer-scaled decimal —
    * aggregation-order-free. Plan: one (source,term) aggregate off the
    * term shuffle, tiny side tables (per-source totals, per-term corpus
    * counts, one scalar row) joined back UNHINTED — AQE broadcasts
    * while they fit; at web scale the term join is the only real
    * shuffle, exactly f6's shape.
    */
  def sourceKlDivergence(docs: DataFrame): DataFrame = {
    // text guard + _outer: identical rows, no scan-side re-split (§6b round-15)
    val terms = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(col("source"), explode_outer(split(col("text"), " ")).as("term"))
    // persist the (source, term) counts: ns/ct/tot are all derived from
    // st, and without the cache each derivation RE-TOKENIZES the corpus
    // (measured: four full explode+agg scans). The cached table is the
    // vocab×|sources| count table — the small thing — and the lazy
    // lineage-backed persist recomputes on executor loss instead of
    // failing (the g5 advice-item pattern).
    val st = terms.groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
      .persist()
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val ct = st.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val tot = ct.agg(sum(col("c_t")).as("n"))
    def ln8(c: Column): Column = round(log(c), 8).cast("decimal(18,8)")
    // tot is one row by construction — the only hinted broadcast here;
    // ns (per-source) and ct (vocabulary-sized) stay unhinted for AQE
    val out = st.join(ns, Seq("source")).join(ct, Seq("term")).crossJoin(broadcast(tot))
      .withColumn("contrib",
        // (10,0) multiplier for the same precision-39 truncation trap
        // documented in tokenEntropy
        (ln8(col("c_st")) - ln8(col("n_s")) - ln8(col("c_t")) + ln8(col("n")))
          * col("c_st").cast("decimal(10,0)"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), sum(col("contrib")).as("s"))
      // no terminal round — same true-decimal-tie hazard as tokenEntropy
      .select(col("source"), col("n_tokens"),
        (col("s").cast("double") / col("n_tokens")).as("kl_div"))
    // materialize the |sources|-row result eagerly (Dedup's
    // checkpointFresh move), then RELEASE the vocab-sized cache — a
    // lazily-returned frame would pin the (source,term) table in
    // executor memory for the rest of the session (the whole Verify/
    // Bench battery runs after this, and Bench invokes f14 three times)
    val materialized = out.localCheckpoint(true)
    st.unpersist(false)
    materialized
  }

  /** Top-k keyword extraction per document: the TF-IDF stage ranked
    * within each doc. `row_number <= k` compiles to WindowGroupLimit, so
    * each partition keeps k rows per doc before the per-doc shuffle.
    */
  def keywords(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tfIdf(docs)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tfidf", "rnk")
  }

  /** F11: fixed-budget overlapping chunk splitting — the window step
    * that turns documents into training/RAG chunks: `chunk`-token
    * pieces every `stride` tokens (so consecutive chunks overlap by
    * chunk − stride), last piece truncated at the document end.
    * nChunks = 1 + ⌈max(0, n − chunk) / stride⌉ covers every token
    * without emitting a trailing piece that is a pure suffix of the
    * previous one. Entirely row-local (one explode, no shuffle): the
    * output is written partition-parallel, ~chunk/stride × the corpus
    * bytes, which is the operator's irreducible cost at any scale.
    */
  def chunkSplit(docs: DataFrame, chunk: Int = 64, stride: Int = 48): DataFrame =
    Dedup.spread(docs)
      // text guard + _outer: nc >= 1 always, so the id range is never
      // empty and no inferred filter re-derives it in the scan
      // (§6b round-15)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), col("tok"),
        (lit(1L) + floor((greatest(lit(0), size(col("tok")) - chunk)
          + (stride - 1)).cast("double") / lit(stride.toDouble)).cast("long")).as("nc"))
      .select(col("doc_id"), col("tok"),
        explode_outer(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("tok"), (col("chunk_id") * stride + 1).cast("int"), lit(chunk)).as("ct"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(col("ct"), " ").as("chunk_text"),
        size(col("ct")).cast("long").as("n_chunk_tokens"))

  /** F12: BM25 ranked retrieval — the lexical search engine scoring
    * function (Robertson-Sparck Jones idf in the Lucene +1 form, so
    * weights stay positive even for terms in most docs; k1 = 1.2,
    * b = 0.75), the retrieval twin of F6's raw TF-IDF weights. Corpus
    * stats (N, avgdl) ride as a broadcast one-row literal; per-term
    * tf shuffles once on (doc, term) AFTER the query-term filter — the
    * scan only keeps the |q| matching terms per doc, so the shuffled
    * volume is O(matching docs × |q|), never the corpus token stream.
    * FP portability: idf through round(ln, 8) (the f6/f9 recipe — ln
    * proved libm-parity-stable at 8 dp), each term weight rounded to
    * 8 dp, the per-doc sum through decimal so the reduction is
    * associative, ties on (score desc, doc_id). Top-k compiles to
    * TakeOrderedAndProject. At 100 TB the df/stats broadcasts are
    * (|vocab∩q|+1) rows — bounded by the query, not the corpus.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int = 10): DataFrame = {
    // NO spread (termCells' reasoning): the query-term filter prunes
    // the explode immediately — the map pass is too light to repartition
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), col("tok"), size(col("tok")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val tf = toks
      // _outer: tok non-empty (split of non-null text), no scan-side
      // re-split (§6b round-15)
      .select(col("doc_id"), col("dl"), explode_outer(col("tok")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tf"), col("dl"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"),
        round(log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)), 8).as("idf"))
      .select(col("doc_id"),
        round(col("idf") * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
          8).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w").cast("decimal(18,8)")).cast("double").as("score"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The f12 query: one rare term ('dup' — the near-duplicate marker,
    * df ≈ 5% of docs) and two common ones, so the idf spread actually
    * exercises the weighting.
    */
  val bm25QueryTerms: Seq[String] = Seq("dup", "vector", "window")

  /** The Gopher required-stopword list (Rae et al. 2021, appendix A1.1:
    * a document must contain at least 2 of these to pass).
    */
  private val gopherStop =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** F15: Gopher-style document quality gates (Rae et al. 2021, the
    * MassiveWeb filter set) — the rule battery LLM pipelines run before
    * any model-based scoring: word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio (# and ellipsis), alphabetic-word
    * fraction, and the required-stopword test. The line-level rules
    * (bullet/ellipsis line fractions) are omitted because this corpus
    * is single-line by construction; the doc-level battery is the
    * discriminating part here (the stopword gate splits en from
    * es/de/fr/zh, the word-count gate splits short docs).
    *
    * All counts are exact integers, every ratio one double division —
    * engine-portable with no rounding. Pure per-row expressions: at
    * 100 TB this runs at scan speed inside WholeStageCodegen and is
    * the cheapest possible admission gate (f2's shape). The token
    * array is materialized ONCE in its own projection; every consumer
    * reads the attribute (§6b CollapseProject rule).
    */
  def gopherRules(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"),
        size(col("tok")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("word_chars"),
        // two separate counts, not one alternation: Java regex is
        // leftmost-first, RE2 leftmost-longest — identical only when
        // the patterns can't compete for the same position
        (regexp_count(col("text"), lit("#"))
          + regexp_count(col("text"), lit("\\.\\.\\."))).cast("long").as("n_symbols"),
        size(filter(col("tok"), w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha_words"),
        gopherStop.map(w => when(array_contains(col("tok"), w), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("req_stop_hits"))
      .select(col("doc_id"), col("n_words"), col("word_chars"), col("n_symbols"),
        col("n_alpha_words"), col("req_stop_hits"),
        (col("word_chars").cast("double") / col("n_words")).as("mean_word_len"),
        (col("n_symbols").cast("double") / col("n_words")).as("symbol_ratio"),
        (col("n_alpha_words").cast("double") / col("n_words")).as("alpha_word_frac"))
      .withColumn("r_word_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mean_len", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha", col("alpha_word_frac") >= 0.8)
      .withColumn("r_stopword", col("req_stop_hits") >= 2)
      .withColumn("passes_gopher",
        col("r_word_count") && col("r_mean_len") && col("r_symbol")
          && col("r_alpha") && col("r_stopword"))

  /** F17: bigram language-model scoring — the next step up from F9's
    * unigram CCNet-style filter: each document scored by the corpus's
    * own add-one-smoothed bigram model, p(w2|w1) = (c(w1 w2) + 1) /
    * (c(w1 ·) + V). Low-tail documents read as token soup to their own
    * corpus — the standard perplexity-filter admission signal.
    *
    * Plan shape: bigrams are built row-locally from the token array
    * (guarded `sequence`, §6b — a doc below 2 tokens yields an empty
    * array and simply drops out of the explode, never a negative
    * range), shuffle once on the gram key for counts; the prefix
    * totals and the model join are gram-keyed aggregates of that same
    * count table (vocab²-bounded, not corpus-bounded); V rides as a
    * broadcast scalar. The per-doc mean folds ln-at-8dp values through
    * DECIMAL(18,8) so the reduction is associative — bit-identical
    * across partitionings and engines (f9's recipe).
    */
  def bigramLogprob(docs: DataFrame): DataFrame = {
    // row guard + _outer: same drop-out, no inferred filter re-running
    // the bigram build in the scan (§6b round-15)
    val grams = Dedup.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(col("doc_id"), explode_outer(
        transform(sequence(lit(1), size(col("tok")) - 1), i =>
          concat_ws(" ", element_at(col("tok"), i), element_at(col("tok"), i + 1)))).as("gram"))
    val c2 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val cpre = c2.groupBy(col("w1")).agg(sum(col("c")).as("cpre"))
    val vocab = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(explode_outer(split(col("text"), " ")).as("term"))
      .agg(countDistinct(col("term")).as("vocab"))
    // the w1/gram model joins are vocab-sized — UNHINTED (AQE
    // broadcasts while they fit, term-keyed shuffle join beyond; the
    // f6/f9 class); only the 1-row V keeps its hint
    val lp = c2.join(cpre, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        round(log((col("c") + 1.0) / (col("cpre") + col("vocab"))), 8))
    grams.join(lp.select(col("gram"), col("logp")), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("logp").cast("decimal(18,8)")).cast("double") / count(lit(1)))
          .as("mean_logprob"))
  }

  /** F23: PMI collocation lexicon — the corpus-level association
    * ranking of adjacent word pairs (pointwise mutual information over
    * bigram events): pmi(w1,w2) = ln(c12·B / (cpre(w1)·csuf(w2))),
    * where c12 counts the bigram, cpre/csuf count the left/right word
    * as a bigram member, and B totals all bigram events. High-PMI
    * pairs co-occur far above chance — the lexicon a tokenizer's merge
    * list or a phrase-mining pass starts from (F17 scores documents
    * against the bigram model; this op ranks the pairs themselves).
    *
    * Plan: F17's row-local gram build feeds ONE gram-keyed count —
    * after that every relation is vocab- or vocab²-bounded, never
    * corpus-bounded: cpre/csuf are word-keyed aggregates OF the count
    * table, B is a 1-row scalar broadcast (the psiFromCells idiom —
    * no single-partition window), and the close is a
    * TakeOrderedAndProject top-k, so the corpus is scanned exactly
    * once at any scale. Portability: all counts are exact longs (the
    * oracle casts DuckDB's HUGEINT sums back), the PMI ratio is
    * spelled as the identical numerator·total / (left·right) double
    * sequence on both engines, and ln pins to 8 dp (§6b). `minCount`
    * fences the unstable low-count tail (PMI diverges as counts → 1);
    * 5 keeps 900 of the corpus's 961 possible pairs at both verify
    * SFs — non-degenerate in each direction.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, k: Int = 20): DataFrame =
    pmiFromCounts(gramCounts(docs), minCount, k)

  /** F23b: the INCREMENTAL form — bigram counts are mergeable by plain
    * addition (the sketch-merge property for free, since the model IS
    * a count table), so a daily lexicon refresh aggregates only the
    * new slice and merges: here two corpus slices' count tables union
    * + re-sum into the SAME downstream PMI algebra, hash-matching the
    * one-shot oracle exactly (b35's merge-equivalence pattern).
    */
  def pmiCollocationsMerged(docs: DataFrame, minCount: Long = 5,
                            k: Int = 20): DataFrame =
    pmiFromCounts(
      gramCounts(docs.filter(col("doc_id") % 2 === 0))
        .union(gramCounts(docs.filter(col("doc_id") % 2 === 1)))
        .groupBy(col("gram")).agg(sum(col("c12")).as("c12")),
      minCount, k)

  /** The corpus pass of F23: one gram-keyed count table. */
  // spread stays even though this is one light pass — it is also the
  // reuse barrier that keeps the four f23 consumers on ONE corpus scan
  // (termCells' reasoning; the PlanSpec scan-count pin)
  private def gramCounts(docs: DataFrame): DataFrame =
    Dedup.spread(docs)
      .select(split(col("text"), " ").as("tok"))
      // row guard + _outer: no inferred filter re-running the bigram
      // build in the scan (§6b round-15)
      .filter(size(col("tok")) >= 2)
      .select(explode_outer(
        transform(sequence(lit(1), size(col("tok")) - 1), i =>
          concat_ws(" ", element_at(col("tok"), i), element_at(col("tok"), i + 1)))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c12"))

  /** The vocab²-bounded close of F23, shared by the one-shot and
    * merged forms so the lexicon algebra exists exactly once.
    */
  private def pmiFromCounts(counts: DataFrame, minCount: Long,
                            k: Int): DataFrame = {
    val c2 = counts
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val cpre = c2.groupBy(col("w1")).agg(sum(col("c12")).as("cpre"))
    val csuf = c2.groupBy(col("w2")).agg(sum(col("c12")).as("csuf"))
    val tot = c2.agg(sum(col("c12")).as("btot"))
    c2.filter(col("c12") >= minCount)
      .join(cpre, Seq("w1")).join(csuf, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("gram"), col("c12"),
        round(log(col("c12").cast("double") * col("btot") /
          (col("cpre").cast("double") * col("csuf"))), 8).as("pmi"))
      .orderBy(col("pmi").desc, col("gram"))
      .limit(k)
  }

  /** F24: tokenizer APPLY — the missing half of F23's lexicon build:
    * greedy leftmost segmentation of each document against a learned
    * BOUNDED merge table (the top-PMI collocations, collected once as
    * driver-known model state — the IVF-centroid / C17 rules-as-data
    * class). A doc's learned-vocab token count is its whitespace count
    * minus the merges the greedy scan commits: scan left to right, and
    * when the (wᵢ, wᵢ₊₁) bigram is in the merge table, emit one merged
    * token and consume both words (a consumed word cannot start
    * another merge — the standard leftmost-greedy tokenizer contract).
    * This upgrades f3/i9/i11's whitespace counts to the number a real
    * training pipeline budgets in (i9b/i11b run on exactly this
    * count).
    *
    * Portability: the scan is a single integer left fold — the state
    * packs (emitted count, consumed flag) into one BIGINT as cnt·2 +
    * skip, so the oracle folds the identical shift/mask arithmetic
    * (no struct state, no floats anywhere). The fold consumes `tok`
    * as a bound attribute from its own projection (never an inlined
    * split — the §6b lambda rule), so the text splits once per row.
    */
  def bpeSegment(docs: DataFrame, k: Int = 16, minCount: Long = 5,
                 carry: Seq[String] = Nil): DataFrame =
    bpeSegmentWith(docs,
      pmiCollocations(docs, minCount, k)
        .select(col("gram")).collect().map(_.getString(0)).toIndexedSeq,
      carry)

  /** [[bpeSegment]] with an explicit merge table (for the spec's hand
    * cases and any externally-learned lexicon). `carry` threads extra
    * columns (i11b's source) through the fold projection.
    */
  def bpeSegmentWith(docs: DataFrame, merges: Seq[String],
                     carry: Seq[String] = Nil): DataFrame = {
    val mergeLit = typedLit(merges)
    val c = carry.map(col)
    // spread: the per-doc merge fold below is the operator's CPU, and
    // the local documents file has ~2 splits (§6b round-15)
    Dedup.spread(docs)
      .select(c ++ Seq(col("doc_id"), split(col("text"), " ").as("tok")): _*)
      .select(c ++ Seq(col("doc_id"),
        size(col("tok")).cast("long").as("ws_tokens"),
        aggregate(sequence(lit(1), size(col("tok"))), lit(0L), (acc, i) => {
          val skip = acc.bitwiseAND(lit(1L))
          val newCnt = shiftright(acc, 1) + (lit(1L) - skip)
          // CaseWhen is lazy: element_at(tok, i+1) only evaluates when
          // i < size(tok), so the ANSI out-of-bounds error cannot fire
          val newSkip = when(skip === 1L || i === size(col("tok")), lit(0L))
            .otherwise(when(array_contains(mergeLit,
              concat_ws(" ", element_at(col("tok"), i),
                element_at(col("tok"), i + 1))), lit(1L)).otherwise(lit(0L)))
          shiftleft(newCnt, 1) + newSkip
        }).as("st")): _*)
      .select(c ++ Seq(col("doc_id"), col("ws_tokens"),
        shiftright(col("st"), 1).as("bpe_tokens"),
        (col("ws_tokens") - shiftright(col("st"), 1)).as("n_merges")): _*)
  }

  /** F16: per-source boilerplate detection — the recurring-template
    * finder (site headers, license blurbs, navigation chrome repeat
    * VERBATIM across a source's documents; RefinedWeb/C4 both strip
    * them): for each source, the word-`n`-gram appearing in the most
    * DISTINCT documents of that source, with a deterministic (df desc,
    * gram asc) tie-break, plus how much of the source it covers.
    *
    * Plan: row-local gram build → per-doc distinct → one (source,gram)
    * aggregate; `row_number = 1` compiles to WindowGroupLimit so each
    * partition prunes to its local argmax per source BEFORE the
    * |sources|-keyed exchange. Output is |sources| rows. At 100 TB the
    * gram table is the operator's real cost (d12's class — one corpus
    * pass, counted grams on the wire, never raw text twice).
    */
  def boilerplate(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Dedup.spread(docs)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("tok"))
      // row guard + _outer: no inferred filter re-running the gram
      // build in the scan (§6b round-15)
      .filter(size(col("tok")) >= n)
      .select(col("source"), col("doc_id"), explode_outer(
        transform(sequence(lit(1), size(col("tok")) - (n - 1)),
          i => array_join(slice(col("tok"), i, lit(n)), " "))).as("gram"))
      .distinct()
    val df = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("source")).orderBy(col("df").desc, col("gram"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(nDocs, Seq("source"))
      .select(col("source"), col("gram").as("boilerplate_gram"), col("df"),
        col("n_docs"),
        (col("df").cast("double") / col("n_docs")).as("boilerplate_frac"))
  }

  /** F22: corpus-frequent span STRIPPING — the rewrite half of the
    * boilerplate story (F16 detects; this removes): C4/RefinedWeb-style
    * cleaning drops the recurring template spans (headers, license
    * blurbs, lifted near-dup passages) from each document and keeps the
    * rest, in order. Semantics are COVERAGE-based, not greedy-match:
    * a token survives iff NO occurrence of any corpus-frequent word
    * `n`-gram (appearing in ≥ `minDf` distinct docs) covers its
    * position — deterministic under overlap (greedy left-to-right would
    * need a tie rule; coverage needs none), so the rebuilt text is
    * engine-portable verbatim.
    *
    * Plan: two row-local explodes of the same scan (positioned grams;
    * positioned tokens), one gram-keyed aggregate for the frequent set
    * (AQE broadcasts it back while it fits — it is the template list,
    * orders of magnitude smaller than the corpus), covered positions
    * via a semi join + bounded explode (×n), and the reconstruction is
    * one (doc_id, pos) anti join + per-doc ordered fold. At 100 TB the
    * anti join and the rebuild both key on doc_id — a doc_id-bucketed
    * layout (A12) makes them co-located; the wire carries counted grams
    * and (doc, pos) ints, never text twice. Output: per doc, the token
    * budget before/after and the cleaned text (exact strings/longs —
    * full oracle).
    */
  def boilerplateStrip(docs: DataFrame, n: Int = 4, minDf: Int = 3): DataFrame = {
    val toks = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
    // row guard + _outer: no inferred filter re-running the positioned
    // gram build in the scan (§6b round-15)
    val pg = toks.filter(size(col("tok")) >= n)
      .select(col("doc_id"), explode_outer(
        transform(sequence(lit(1), size(col("tok")) - (n - 1)),
          i => struct(i.as("pos"),
            array_join(slice(col("tok"), i, lit(n)), " ").as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val freq = pg.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gram"))
    val covered = pg.join(freq, Seq("gram"), "left_semi")
      .select(col("doc_id"),
        // _outer: an ascending literal-width sequence is never empty;
        // the plain form's inferred filter allocates and sizes it a
        // second time per row (§6b round-15)
        explode_outer(sequence(col("pos"), col("pos") + (n - 1))).as("cpos"))
      .distinct()
    val tokPos = toks
      .select(col("doc_id"), posexplode_outer(col("tok")).as(Seq("p0", "tk")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tk"))
    val kept = tokPos.join(
      covered.select(col("doc_id"), col("cpos").as("pos")),
      Seq("doc_id", "pos"), "left_anti")
    // per-doc ordered rebuild: array_sort on (pos, tk) structs orders by
    // the unique int pos — shuffle-order-independent, matching the
    // oracle's string_agg(... ORDER BY pos)
    val clean = kept.groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tk")))),
          x => x.getField("tk")), " ").as("clean_text"))
    val removed = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"))
    toks.select(col("doc_id"), size(col("tok")).cast("long").as("n_tokens"))
      .join(removed, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The corpus-frequent gram set as a bounded driver value — the
    * template MODEL the serving/streaming strip consumes (C17's
    * rules-as-data discipline: the template list is orders of magnitude
    * smaller than the corpus — it is the recurring chrome, not the
    * text). Sorted for a deterministic literal; the size guard keeps a
    * mis-tuned minDf from collecting a corpus-sized set to the driver.
    */
  def frequentGrams(docs: DataFrame, n: Int = 4, minDf: Int = 3,
                    maxTemplates: Int = 100000): Seq[String] = {
    val toks = Dedup.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
    // row guard + _outer: no inferred filter re-running the gram build
    // in the scan (§6b round-15)
    val grams = toks.filter(size(col("tok")) >= n)
      .select(col("doc_id"), explode_outer(
        transform(sequence(lit(1), size(col("tok")) - (n - 1)),
          i => array_join(slice(col("tok"), i, lit(n)), " "))).as("gram"))
      .distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gram")).collect().map(_.getString(0)).sorted.toSeq
    require(grams.size <= maxTemplates,
      s"template set ${grams.size} exceeds $maxTemplates — raise minDf")
    grams
  }

  /** [[boilerplateStrip]]'s ROW-LOCAL form against an explicit template
    * list: identical coverage semantics, but the frequent-gram set
    * arrives as a bounded literal instead of being derived in-plan — so
    * the whole strip is a pure per-row projection chain (no join, no
    * shuffle, no state), which is what a streaming admission gate
    * (H24) or a serve-time cleaner needs. With
    * `templates = frequentGrams(corpus, n, minDf)` the output is
    * bit-identical to `boilerplateStrip(corpus, n, minDf)` — pinned in
    * the streaming parity spec, not assumed. One HOF stage per
    * projection (§6b); per-row cost is O(tokens × log |templates|)
    * via the sorted-array membership scan.
    */
  def stripWithTemplates(docs: DataFrame, templates: Seq[String],
                         n: Int = 4): DataFrame = {
    val tmpl = typedLit(templates)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), col("tok"),
        filter(
          when(size(col("tok")) >= n,
            sequence(lit(1), size(col("tok")) - (n - 1)))
            .otherwise(array().cast("array<int>")),
          i => array_contains(tmpl, array_join(slice(col("tok"), i, lit(n)), " ")))
          .as("starts"))
      .select(col("doc_id"), col("tok"),
        array_distinct(flatten(transform(col("starts"),
          i => sequence(i, i + (n - 1))))).as("covered"))
      .select(col("doc_id"), col("tok"), col("covered"),
        filter(sequence(lit(1), size(col("tok"))),
          p => !array_contains(col("covered"), p)).as("kept"))
      .select(col("doc_id"),
        size(col("tok")).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_removed"),
        array_join(transform(col("kept"),
          p => element_at(col("tok"), p)), " ").as("clean_text"))
  }

  /** F18: n-gram novelty scoring — the marginal-contribution signal
    * data-pruning pipelines rank by ("how much of this document has
    * the corpus already seen?"): per doc, the fraction of its DISTINCT
    * word-`n`-grams whose first corpus occurrence (min doc_id) is an
    * earlier document. Ingest-order doc_ids make this "novel at the
    * time it arrived"; near-dups score ≈ 0, fresh text ≈ 1.
    *
    * Plan: row-local gram build → per-doc distinct (one gram-keyed
    * shuffle) → min-doc_id per gram (map-side combined) → join back on
    * the gram key it is ALREADY partitioned by → per-doc count. Counts
    * are exact integers, the score one double division. At 100 TB the
    * wire carries counted grams once (d12's corpus-pass class); 64-bit
    * gram fingerprints are the bandwidth cut when gram strings dominate
    * (trade: loses the SQL-oracle portability the string form keeps).
    */
  def novelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val dg = Dedup.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      // row guard + _outer: no inferred filter re-running the gram
      // build in the scan (§6b round-15)
      .filter(size(col("tok")) >= n)
      .select(col("doc_id"), explode_outer(
        transform(sequence(lit(1), size(col("tok")) - (n - 1)),
          i => array_join(slice(col("tok"), i, lit(n)), " "))).as("gram"))
      .distinct()
    val first = dg.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    dg.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        (lit(1.0) - col("n_seen").cast("double") / col("n_grams")).as("novelty"))
  }

  /** F20: Zipf rank-frequency slope — the corpus-health diagnostic
    * (natural language sits near slope −1 on log rank vs log freq;
    * generated/templated text flattens or cliffs): least-squares fit of
    * ln(freq) on ln(rank) over the top-`topK` terms. The term count is
    * the f6 shuffle; the top-K compiles to TakeOrderedAndProject
    * (per-partition heads, never a vocab sort) and the rank window then
    * runs over the collected K rows only — bounded like e10's pool.
    * Portability: both lns pinned at 8 dp into DECIMAL(10,8); ALL
    * closing algebra is exact width-planned decimal — the round-13
    * sf1 miss proved a double mul-sub chain (n·Σxy − Σx·Σy) is
    * value-dependently FMA-contractible on the oracle engine, so no
    * compound double expression survives here. The c24 overflow class
    * is dodged by casting each sum DOWN to a width its value range
    * admits with headroom (x,y ∈ (−100,100) at 8 dp; ≤ topK=100
    * terms): Σ terms at (12,8)/(24,16) — the product widths carry 8
    * integer digits, safe past freq ≈ e^1000 (round-14 advice: the
    * old (20,16) overflowed at max ln(freq) ~27) — products peak at
    * sy·sx2 − sx·sxy = (38,24), exactly 38. Each
    * output is then ONE double division of two exact decimals —
    * single-op IEEE, bit-portable (intercept uses the algebraic form
    * (Σy·Σx² − Σx·Σxy)/D ≡ (Σy − slope·Σx)/n to stay a single
    * divide).
    */
  def zipfSlope(docs: DataFrame, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Dedup.spread(docs).filter(col("text").isNotNull)
      .select(explode_outer(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topK)
    val w = Window.orderBy(col("freq").desc, col("term"))
    val nd = col("n").cast("decimal(4,0)")
    val den = (nd * col("sx2") - col("sx") * col("sx")).cast("double")
    top
      .select(col("freq"), row_number().over(w).cast("long").as("rnk"))
      .select(
        round(log(col("rnk").cast("double")), 8).cast("decimal(10,8)").as("x"),
        round(log(col("freq").cast("double")), 8).cast("decimal(10,8)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(12,8)").as("sx"),
        sum(col("y")).cast("decimal(12,8)").as("sy"),
        // (24,16), not the value-minimal (20,16) (round-14 advice): the
        // old width held Σxy only while max ln(freq) stayed under ~e²⁷ —
        // a larger corpus would hit an ANSI cast overflow at runtime.
        // 8 integer digits push that bound past any physical corpus
        // (Σy² ≥ 10⁸ over 100 terms needs freq ≥ e^1000), and the
        // widest downstream product, sy·sx2 − sx·sxy at (38,24), still
        // fits exactly
        sum(col("x") * col("y")).cast("decimal(24,16)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(24,16)").as("sx2"))
      .select(col("n").as("n_terms"),
        ((nd * col("sxy") - col("sx") * col("sy")).cast("double") / den)
          .as("slope"),
        ((col("sy") * col("sx2") - col("sx") * col("sxy")).cast("double") / den)
          .as("intercept"))
  }

  /** The term-count cell table of a corpus slice — the unit both F21's
    * batch comparison and H21's streaming monitor are built from (one
    * shared derivation, so stream and batch cannot drift).
    */
  def termCells(docs: DataFrame): DataFrame =
    // text guard + _outer: identical rows, no scan-side re-split (§6b
    // round-15). spread stays even though this pass is light: the
    // repartition exchange is ALSO what keeps the cell table's
    // downstream branches canonically equal — without it f21's four
    // consumers re-scanned the corpus 4× (the PlanSpec reuse pin),
    // which costs more than the exchange ever does
    Dedup.spread(docs).filter(col("text").isNotNull)
      .select(explode_outer(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** F21: vocabulary drift — the PSI stability index on TERM cells
    * instead of c24's value grid: "has the live corpus's vocabulary
    * distribution moved away from the reference slice". PSI's
    * no-smoothing variant handles unseen terms natively (a term absent
    * from either side is skipped, counts still enter the totals), which
    * is exactly the failure mode KL(live‖ref) cannot survive. The
    * score rides the SHARED Fraud.psiFromCells arithmetic — the same
    * decimal-exact mass products and 8dp lns as c24/H17, so the
    * streaming twin (H21) is bit-identical by construction. At web
    * scale the cell table is vocabulary-sized: top-K vocab + an
    * aggregated tail cell is the bandwidth cut (same trade as f9's).
    */
  /** The (term, c0, c1) cell table both f21 forms score — ONE builder
    * (full-outer join of the two slices' term cells, absences as zero
    * counts) so the exact and top-K paths can never drift.
    */
  private def joinedTermCells(reference: DataFrame,
                              incoming: DataFrame): DataFrame =
    termCells(reference).withColumnRenamed("cnt", "c0")
      .join(termCells(incoming).withColumnRenamed("cnt", "c1"),
        Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c0"), lit(0L)).as("c0"),
        coalesce(col("c1"), lit(0L)).as("c1"))

  def vocabPsi(reference: DataFrame, incoming: DataFrame): DataFrame =
    Fraud.psiFromCells(
      joinedTermCells(reference, incoming).select(col("c0"), col("c1")))

  /** F21b: the at-scale vocabulary-PSI cut — top-`topK` reference terms
    * kept as individual cells, everything else folded into ONE tail
    * cell (mass preserved, so the totals n0/n1 equal the exact form's
    * bit-for-bit). This is the benched 100 TB shape: the PSI algebra
    * runs over ≤ topK+1 cells however large the vocabulary, while the
    * exact f21 keeps a cell per term.
    *
    * The cut is DETERMINISTIC and engine-portable, so unlike a sketch
    * it carries a full oracle: membership is decided by comparing each
    * cell against the K-th boundary under the total order
    * (c0 DESC, term ASC) — `c0 > kc OR (c0 = kc AND term <= kt)` — the
    * f20 recipe (binary string collation agrees across engines). The
    * boundary itself comes from two chained TakeOrderedAndProject
    * limits (top-K, then its minimum) — never a vocabulary-wide rank
    * window; the tail fold is one scalar aggregate. A vocabulary
    * smaller than K degenerates to the exact statistic (every cell is
    * top, the tail is the empty (0,0) cell, which the both-present
    * filter drops and whose mass contribution is zero).
    */
  def vocabPsiTopK(reference: DataFrame, incoming: DataFrame,
                   topK: Int = 256): DataFrame =
    psiTopKFromCells(joinedTermCells(reference, incoming), topK)

  /** The top-K + tail cut on an explicit (term, c0, c1) cell table —
    * shared by the batch f21b entry above and the H21 streaming serve
    * path (`DriftStream.vocabPsiTopKFromCells`), so the streamed
    * at-scale score is bit-identical to the batch one by construction
    * (the psiFromCells sharing rule applied to the cut itself).
    */
  def psiTopKFromCells(cells: DataFrame, topK: Int = 256): DataFrame = {
    // The trailing `c1` sort key is UNREACHABLE (cells are keyed by
    // term, so (c0, term) is already a total order) — its only job is
    // to keep the c1 count referenced in the boundary subplan. Without
    // it, column pruning rewrites the boundary's incoming-side
    // aggregate to a count-less distinct, whose exchange no longer
    // canonically matches the main branch's — and the boundary then
    // pays a THIRD corpus scan instead of a ReusedExchange (found via
    // the round-7 advice's scan-count audit; PlanSpec now bounds the
    // f21 final plans at two scans).
    val boundary = cells.select(col("c0"), col("term"), col("c1"))
      .orderBy(col("c0").desc, col("term").asc, col("c1")).limit(topK)
      .orderBy(col("c0").asc, col("term").desc).limit(1)
      .select(col("c0").as("kc"), col("term").as("kt"))
    val tagged = cells.crossJoin(broadcast(boundary))
      .withColumn("is_top", col("c0") > col("kc") ||
        (col("c0") === col("kc") && col("term") <= col("kt")))
    val top = tagged.filter(col("is_top")).select(col("c0"), col("c1"))
    val tail = tagged.filter(!col("is_top"))
      .agg(coalesce(sum(col("c0")), lit(0L)).cast("long").as("c0"),
        coalesce(sum(col("c1")), lit(0L)).cast("long").as("c1"))
    Fraud.psiFromCells(top.unionByName(tail))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f21_vocab_psi" -> ((s, d) => {
      val docs = t(s, d, "documents")
      vocabPsi(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    }),
    // topK pinned to 16 here (operator default 256): the synthetic
    // documents corpus has a 31-word vocabulary, so only a sub-vocab K
    // makes the tail cell real — with K >= |vocab| the cut provably
    // degenerates to the exact statistic and the oracle would check
    // nothing beyond f21's
    "f21_vocab_psi_topk" -> ((s, d) => {
      val docs = t(s, d, "documents")
      vocabPsiTopK(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), topK = 16)
    }),
    "f20_zipf_slope" -> ((s, d) => zipfSlope(t(s, d, "documents"))),
    "f16_boilerplate" -> ((s, d) => boilerplate(t(s, d, "documents"))),
    // n=4/minDf=3 sized against the generated corpus (31-word vocab,
    // near-dup clusters): strips ~2-3% of tokens across ~10% of docs at
    // both verify SFs — non-degenerate in each direction
    "f22_boilerplate_strip" -> ((s, d) => boilerplateStrip(t(s, d, "documents"))),
    "f18_novelty" -> ((s, d) => novelty(t(s, d, "documents"))),
    "f15_gopher_rules" -> ((s, d) => gopherRules(t(s, d, "documents"))),
    "f17_bigram_logprob" -> ((s, d) => bigramLogprob(t(s, d, "documents"))),
    // minCount=5 / k=20 sized against the corpus: 900 of 961 possible
    // pairs clear the count floor, PMI spread ~[-0.73, 0.46]
    "f23_pmi_collocations" -> ((s, d) => pmiCollocations(t(s, d, "documents"))),

    // F24: greedy tokenizer apply — per-doc learned-vocab token counts
    // against the top-16 PMI merge table (driver-known model state).
    "f24_bpe_segment" -> ((s, d) => bpeSegment(t(s, d, "documents"))),
    // f23's merge twin: slice counts merged by addition, same close,
    // same oracle (merge-equivalence, the b35/b37 pattern)
    "f23b_pmi_merge" -> ((s, d) => pmiCollocationsMerged(t(s, d, "documents"))),
    "f12_bm25_search" -> ((s, d) => bm25(t(s, d, "documents"), bm25QueryTerms)),
    "f11_chunk_split" -> ((s, d) => chunkSplit(t(s, d, "documents"))),
    "f9_unigram_logprob" -> ((s, d) => unigramLogprob(t(s, d, "documents"))),
    "f13_token_entropy" -> ((s, d) => tokenEntropy(t(s, d, "documents"))),
    "f14_source_kl" -> ((s, d) => sourceKlDivergence(t(s, d, "documents"))),
    "f7_repetition" -> ((s, d) => repetition(t(s, d, "documents"))),
    "f8_pii_redact" -> ((s, d) => piiRedact(t(s, d, "documents"))),
    "f10_keywords" -> ((s, d) => keywords(t(s, d, "documents"))),
    "f6_tfidf" -> ((s, d) => tfIdf(t(s, d, "documents"))),
    "f5_normalize" -> ((s, d) => normalize(t(s, d, "documents"))),
    "f1_lang_id" -> ((s, d) => langId(t(s, d, "documents"))),
    "f2_quality" -> ((s, d) => quality(t(s, d, "documents"))),
    "f3_token_count" -> ((s, d) => tokenCounts(t(s, d, "documents"))),
    "f4_fingerprint" -> ((s, d) => fingerprint(t(s, d, "documents")))
  )

  /** F23/F24 shared oracle generator: the PMI lexicon with the top-k
    * cut as the one parameter — f24's merge table is pmiSqlK(16)'s
    * grams, so the lexicon arithmetic cannot diverge between the
    * build and the apply.
    */
  private def pmiSqlK(k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
       |grams AS (
       |  SELECT unnest(list_transform(range(1, len(tok)),
       |    i -> tok[i] || ' ' || tok[i + 1])) AS gram
       |  FROM toks),
       |c2 AS (
       |  SELECT gram, count(*) AS c12,
       |         split_part(gram, ' ', 1) AS w1,
       |         split_part(gram, ' ', 2) AS w2
       |  FROM grams GROUP BY 1),
       |cpre AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS cpre FROM c2 GROUP BY 1),
       |csuf AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS csuf FROM c2 GROUP BY 1),
       |tot AS (SELECT CAST(sum(c12) AS BIGINT) AS btot FROM c2)
       |SELECT gram, c12,
       |       round(ln(CAST(c12 AS DOUBLE) * btot
       |                / (CAST(cpre AS DOUBLE) * csuf)), 8) AS pmi
       |FROM c2 JOIN cpre USING (w1) JOIN csuf USING (w2), tot
       |WHERE c12 >= 5
       |ORDER BY pmi DESC, gram
       |LIMIT $k""".stripMargin

  private val pmiSql = pmiSqlK(20)

  /** The F24 segmentation as a reusable CTE block (`bpe(doc_id,
    * source, ws_tokens, bpe_tokens)`) — shared verbatim by the f24
    * oracle and the i9b/i11b integration oracles, so the greedy fold
    * exists in exactly one string. The fold mirrors the engine's
    * packed-BIGINT state bit for bit: acc = cnt·2 + skip, all
    * shift/mask integer ops; the CASE's first branch guards the
    * tok[i+1] lookup exactly like the engine's lazy CaseWhen.
    */
  private[graft] def bpeSegCte(k: Int = 16): String =
    s"""lexlist AS (SELECT list(gram) AS merges FROM (${pmiSqlK(k)}) lx),
       |toks24 AS (SELECT doc_id, source, str_split(text, ' ') AS tok
       |           FROM documents),
       |bpe AS (
       |  SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS ws_tokens,
       |         (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(1, len(tok) + 1),
       |              x -> CAST(x AS BIGINT))),
       |            (acc, i) -> (((acc >> 1) + (1 - (acc & 1))) << 1) +
       |              (CASE WHEN (acc & 1) = 1 OR i = len(tok) THEN 0
       |                    ELSE CAST(list_contains(merges,
       |                           tok[i] || ' ' || tok[i + 1]) AS BIGINT)
       |               END)) >> 1) AS bpe_tokens
       |  FROM toks24, lexlist)""".stripMargin

  private val tfidfSql =
    """WITH terms AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
      |df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
      |SELECT doc_id, tf.term, tf, df.df,
      |       round(ln((n_docs + CAST(1.0 AS DOUBLE)) / (df.df + CAST(1.0 AS DOUBLE))), 8) AS idf,
      |       round(tf * round(ln((n_docs + CAST(1.0 AS DOUBLE)) / (df.df + CAST(1.0 AS DOUBLE))), 8), 8) AS tfidf
      |FROM tf JOIN df ON tf.term = df.term, n""".stripMargin

  def oracles: Map[String, String] = Map(
    // F22: pure string/integer op — the only portability points are the
    // guarded index ranges (DuckDB end-exclusive range() pairs with the
    // Spark when-guarded sequence: both empty below n tokens) and the
    // ordered rebuild (string_agg ORDER BY pos ↔ array_sort on the
    // unique int pos). Coverage semantics make overlap handling
    // tie-rule-free on both engines.
    "f22_boilerplate_strip" ->
      """WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
        |pg AS (SELECT doc_id, unnest(range(1, len(tok) - 2)) AS pos, tok FROM toks),
        |pg2 AS (SELECT doc_id, pos,
        |          array_to_string(list_slice(tok, pos, pos + 3), ' ') AS gram
        |        FROM pg),
        |freq AS (SELECT gram FROM (
        |           SELECT gram, count(DISTINCT doc_id) AS df FROM pg2 GROUP BY 1)
        |         WHERE df >= 3),
        |covered AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 4)) AS cpos
        |            FROM pg2 WHERE gram IN (SELECT gram FROM freq)),
        |tokpos AS (SELECT doc_id, unnest(tok) AS tk,
        |             unnest(range(1, len(tok) + 1)) AS pos
        |           FROM toks),
        |kept AS (SELECT t.doc_id, t.pos, t.tk FROM tokpos t
        |         WHERE NOT EXISTS (SELECT 1 FROM covered c
        |                           WHERE c.doc_id = t.doc_id AND c.cpos = t.pos)),
        |clean AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS clean_text
        |          FROM kept GROUP BY 1),
        |rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |        FROM covered GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens FROM toks)
        |SELECT d.doc_id, d.n_tokens,
        |       coalesce(r.n_removed, 0) AS n_removed,
        |       coalesce(c.clean_text, '') AS clean_text
        |FROM dl d LEFT JOIN rem r USING (doc_id) LEFT JOIN clean c USING (doc_id)""".stripMargin,
    // F15: exact integer counts + single double divisions — the only
    // cross-engine care points are replace-not-regexp for word_chars
    // (f2's recipe) and two separate symbol counts (leftmost-first vs
    // leftmost-longest alternation semantics never compete).
    "f15_gopher_rules" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars,
        |    CAST(len(regexp_extract_all(text, '#'))
        |       + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(str_split(text, ' '),
        |       w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST((CASE WHEN list_contains(str_split(text, ' '), 'the') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'be') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'to') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'of') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'and') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'that') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'have') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(str_split(text, ' '), 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS req_stop_hits
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words, word_chars, n_symbols, n_alpha_words, req_stop_hits,
        |    CAST(word_chars AS DOUBLE) / n_words AS mean_word_len,
        |    CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
        |    CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_word_frac
        |  FROM m)
        |SELECT doc_id, n_words, word_chars, n_symbols, n_alpha_words, req_stop_hits,
        |  mean_word_len, symbol_ratio, alpha_word_frac,
        |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_mean_len,
        |  (symbol_ratio <= 0.1) AS r_symbol,
        |  (alpha_word_frac >= 0.8) AS r_alpha,
        |  (req_stop_hits >= 2) AS r_stopword,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
        |    AND req_stop_hits >= 2) AS passes_gopher
        |FROM r""".stripMargin,

    // F21: c24's PSI arithmetic verbatim on term cells (the decimal
    // widths and 8dp lns are the same psiFromCells recipe).
    "f21_vocab_psi" ->
      """WITH t0 AS (
        |  SELECT term, count(*) AS c0 FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents
        |    WHERE doc_id % 2 = 0) GROUP BY 1),
        |t1 AS (
        |  SELECT term, count(*) AS c1 FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents
        |    WHERE doc_id % 2 = 1) GROUP BY 1),
        |cells AS (
        |  SELECT CAST(coalesce(c0, 0) AS BIGINT) AS c0,
        |         CAST(coalesce(c1, 0) AS BIGINT) AS c1
        |  FROM t0 FULL OUTER JOIN t1 USING (term)),
        |tot AS (
        |  SELECT c0, c1,
        |         CAST(sum(c0) OVER () AS BIGINT) AS n0,
        |         CAST(sum(c1) OVER () AS BIGINT) AS n1
        |  FROM cells),
        |mass AS (
        |  SELECT n0, n1, c0, c1,
        |         CAST(c0 AS DECIMAL(12,0)) * CAST(n1 AS DECIMAL(12,0))
        |          - CAST(c1 AS DECIMAL(12,0)) * CAST(n0 AS DECIMAL(12,0)) AS m
        |  FROM tot WHERE c0 > 0 AND c1 > 0),
        |contrib AS (
        |  SELECT n0, n1,
        |         CAST(m * (CAST(round(ln(c0), 8) AS DECIMAL(10,8))
        |                   - CAST(round(ln(n0), 8) AS DECIMAL(10,8))) AS DECIMAL(37,8))
        |         + CAST(m * (CAST(round(ln(n1), 8) AS DECIMAL(10,8))
        |                     - CAST(round(ln(c1), 8) AS DECIMAL(10,8))) AS DECIMAL(37,8)) AS contrib
        |  FROM mass)
        |SELECT CAST(sum(contrib) AS DOUBLE)
        |         / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS psi,
        |       count(*) AS n_cells_used, n0, n1
        |FROM contrib GROUP BY n0, n1""".stripMargin,

    // F21b: the same PSI arithmetic over the deterministic top-K + tail
    // cut — boundary membership by (c0 DESC, term ASC) comparison (the
    // f20 collation recipe), tail folded by integer sums (HUGEINT cast
    // back to BIGINT, the SURVEY 6b lesson).
    "f21_vocab_psi_topk" ->
      """WITH t0 AS (
        |  SELECT term, count(*) AS c0 FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents
        |    WHERE doc_id % 2 = 0) GROUP BY 1),
        |t1 AS (
        |  SELECT term, count(*) AS c1 FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents
        |    WHERE doc_id % 2 = 1) GROUP BY 1),
        |cells AS (
        |  SELECT term,
        |         CAST(coalesce(c0, 0) AS BIGINT) AS c0,
        |         CAST(coalesce(c1, 0) AS BIGINT) AS c1
        |  FROM t0 FULL OUTER JOIN t1 USING (term)),
        |kth AS (
        |  SELECT c0 AS kc, term AS kt FROM (
        |    SELECT c0, term FROM cells ORDER BY c0 DESC, term ASC LIMIT 16)
        |  ORDER BY c0 ASC, term DESC LIMIT 1),
        |tagged AS (
        |  SELECT c.c0, c.c1,
        |         (c.c0 > kc OR (c.c0 = kc AND c.term <= kt)) AS is_top
        |  FROM cells c CROSS JOIN kth),
        |cut AS (
        |  SELECT c0, c1 FROM tagged WHERE is_top
        |  UNION ALL
        |  SELECT CAST(coalesce(sum(c0), 0) AS BIGINT),
        |         CAST(coalesce(sum(c1), 0) AS BIGINT)
        |  FROM tagged WHERE NOT is_top),
        |tot AS (
        |  SELECT c0, c1,
        |         CAST(sum(c0) OVER () AS BIGINT) AS n0,
        |         CAST(sum(c1) OVER () AS BIGINT) AS n1
        |  FROM cut),
        |mass AS (
        |  SELECT n0, n1, c0, c1,
        |         CAST(c0 AS DECIMAL(12,0)) * CAST(n1 AS DECIMAL(12,0))
        |          - CAST(c1 AS DECIMAL(12,0)) * CAST(n0 AS DECIMAL(12,0)) AS m
        |  FROM tot WHERE c0 > 0 AND c1 > 0),
        |contrib AS (
        |  SELECT n0, n1,
        |         CAST(m * (CAST(round(ln(c0), 8) AS DECIMAL(10,8))
        |                   - CAST(round(ln(n0), 8) AS DECIMAL(10,8))) AS DECIMAL(37,8))
        |         + CAST(m * (CAST(round(ln(n1), 8) AS DECIMAL(10,8))
        |                     - CAST(round(ln(c1), 8) AS DECIMAL(10,8))) AS DECIMAL(37,8)) AS contrib
        |  FROM mass)
        |SELECT CAST(sum(contrib) AS DOUBLE)
        |         / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS psi,
        |       count(*) AS n_cells_used, n0, n1
        |FROM contrib GROUP BY n0, n1""".stripMargin,

    // F20: same (freq desc, term) top-K, lns at 8 dp into decimal,
    // exact decimal regression sums, and the closing algebra spelled
    // as the identical double op sequence.
    "f20_zipf_slope" ->
      """WITH tc AS (
        |  SELECT term, count(*) AS freq FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1),
        |top AS (
        |  SELECT term, freq,
        |         row_number() OVER (ORDER BY freq DESC, term) AS rnk
        |  FROM tc QUALIFY rnk <= 100),
        |xy AS (
        |  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 8) AS DECIMAL(10,8)) AS x,
        |         CAST(round(ln(CAST(freq AS DOUBLE)), 8) AS DECIMAL(10,8)) AS y
        |  FROM top),
        |s AS (
        |  SELECT CAST(count(*) AS DECIMAL(4,0)) AS n,
        |         CAST(SUM(x) AS DECIMAL(12,8)) AS sx,
        |         CAST(SUM(y) AS DECIMAL(12,8)) AS sy,
        |         CAST(SUM(x * y) AS DECIMAL(24,16)) AS sxy,
        |         CAST(SUM(x * x) AS DECIMAL(24,16)) AS sx2
        |  FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |       -- sxw: DuckDB runs int64*int64 products IN int64 (both
        |       -- widths <= 18 overflows at ~9.2e18 despite the wider
        |       -- declared result); promoting ONE factor to width 19
        |       -- forces exact int128 math. Same rational values.
        |       CAST(n * sxy - CAST(sx AS DECIMAL(19,8)) * sy AS DOUBLE)
        |         / CAST(n * sx2 - CAST(sx AS DECIMAL(19,8)) * sx AS DOUBLE) AS slope,
        |       CAST(sy * sx2 - sx * sxy AS DOUBLE)
        |         / CAST(n * sx2 - CAST(sx AS DECIMAL(19,8)) * sx AS DOUBLE) AS intercept
        |FROM s""".stripMargin,

    // F16: exact counts + a (df desc, gram asc) argmax — list_distinct
    // has no cross-engine twin needed because the per-doc distinct is
    // expressed relationally (SELECT DISTINCT) on both sides.
    "f16_boilerplate" ->
      """WITH toks AS (
        |  SELECT source, doc_id, str_split(text, ' ') AS tok FROM documents),
        |grams AS (
        |  SELECT DISTINCT source, doc_id,
        |    unnest(list_transform(range(1, len(tok) - 6),
        |      i -> array_to_string(tok[i:i+7], ' '))) AS gram
        |  FROM toks WHERE len(tok) >= 8),
        |df AS (
        |  SELECT source, gram, count(*) AS df FROM grams GROUP BY 1, 2),
        |top AS (
        |  SELECT source, gram, df FROM (
        |    SELECT source, gram, df,
        |           row_number() OVER (PARTITION BY source
        |                              ORDER BY df DESC, gram) AS rn
        |    FROM df) WHERE rn = 1),
        |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT t.source, t.gram AS boilerplate_gram, t.df, nd.n_docs,
        |       CAST(t.df AS DOUBLE) / nd.n_docs AS boilerplate_frac
        |FROM top t JOIN nd USING (source)""".stripMargin,

    // F18: exact integer counts, one double division; DISTINCT grams
    // and min-doc_id first occurrence are order-free aggregates.
    "f18_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
        |dg AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(tok) - 1),
        |      i -> array_to_string(tok[i:i+2], ' '))) AS gram
        |  FROM toks WHERE len(tok) >= 3),
        |fo AS (
        |  SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
        |       CAST(1.0 AS DOUBLE)
        |         - CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*) AS novelty
        |FROM dg JOIN fo USING (gram) GROUP BY 1""".stripMargin,

    // F17: f9's portability recipe on the bigram model — ln at 8 dp,
    // decimal-folded per-doc sum; range(1, len) is empty for len < 2 in
    // DuckDB just as the guarded sequence is in Spark, so sub-2-token
    // docs drop out identically on both sides.
    // F23: f17's gram CTE, integer counts throughout (HUGEINT sums cast
    // back to BIGINT), the PMI ratio spelled in the Spark column's op
    // order — CAST(c12) DOUBLE · btot first, the left·right product,
    // one division — and ln pinned 8 dp.
    "f23_pmi_collocations" -> pmiSql,

    // F24: the shared segmentation CTE (the merge table is pmiSqlK(16)
    // verbatim — build and apply cannot diverge), closed by the
    // per-doc count report.
    "f24_bpe_segment" ->
      (s"WITH ${bpeSegCte()}\n" +
        """SELECT doc_id, ws_tokens, bpe_tokens,
          |       ws_tokens - bpe_tokens AS n_merges
          |FROM bpe""".stripMargin),
    // f23b merges slice counts by addition into the identical close —
    // exact-count merge-equivalence, so the one-shot oracle is the
    // merged form's oracle too (the b35/b37 pattern).
    "f23b_pmi_merge" -> pmiSql,

    "f17_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tok)),
        |    i -> tok[i] || ' ' || tok[i + 1])) AS gram
        |  FROM toks),
        |c2 AS (
        |  SELECT gram, count(*) AS c, split_part(gram, ' ', 1) AS w1
        |  FROM grams GROUP BY 1),
        |cpre AS (
        |  SELECT w1, CAST(sum(c) AS BIGINT) AS cpre FROM c2 GROUP BY 1),
        |v AS (
        |  SELECT count(DISTINCT term) AS vocab FROM (
        |    SELECT unnest(str_split(text, ' ')) AS term FROM documents)),
        |lp AS (
        |  SELECT gram, round(ln((c + 1.0) / (cpre + vocab)), 8) AS logp
        |  FROM c2 JOIN cpre USING (w1), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(logp AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS mean_logprob
        |FROM grams JOIN lp USING (gram) GROUP BY 1""".stripMargin,

    // F12: same ln-at-8dp idf, same evaluation grouping. The one
    // explicit CAST matters: DuckDB types bare `tf * 2.2` as DECIMAL
    // and computes it EXACTLY (6.6, not double 6.6000000000000005),
    // while divisions of decimals promote to DOUBLE — so the only
    // decimal-vs-double divergence point is that product, pinned to
    // DOUBLE to match Spark's long×double.
    "f12_bm25_search" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
        |dl AS (
        |  SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl FROM toks),
        |stats AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
        |terms AS (
        |  SELECT doc_id, unnest(tok) AS term FROM toks),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE term IN ('dup', 'vector', 'window') GROUP BY 1, 2),
        |df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |w AS (
        |  SELECT t.doc_id,
        |         round(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 8)
        |               * (t.tf * CAST(2.2 AS DOUBLE))
        |               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
        |                    / (CAST(s.total_dl AS DOUBLE) / s.n_docs))), 8) AS w
        |  FROM tf t JOIN df d USING (term) JOIN dl l USING (doc_id), stats s),
        |sc AS (
        |  SELECT doc_id,
        |         CAST(sum(CAST(w AS DECIMAL(18,8))) AS DOUBLE) AS score,
        |         count(*) AS n_matched
        |  FROM w GROUP BY 1)
        |SELECT doc_id, score, n_matched FROM sc
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // F11: same chunk-count formula (floor over non-negative doubles is
    // engine-identical), same 1-based inclusive slicing semantics.
    "f11_chunk_split" ->
      """WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
        |n AS (SELECT doc_id, t,
        |        CAST(1 + floor((greatest(0, len(t) - 64) + 47) / CAST(48 AS DOUBLE)) AS BIGINT) AS nc
        |      FROM toks),
        |ch AS (SELECT doc_id, t, unnest(range(0, nc)) AS chunk_id FROM n)
        |SELECT doc_id, chunk_id,
        |       array_to_string(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
        |       CAST(least(chunk_id * 48 + 64, len(t)) - chunk_id * 48 AS BIGINT) AS n_chunk_tokens
        |FROM ch""".stripMargin,
    "f9_unigram_logprob" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM terms GROUP BY term),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS vocab FROM tc),
        |lp AS (
        |  SELECT term,
        |         round(ln((c + CAST(1.0 AS DOUBLE)) / (total + vocab)), 8) AS logp
        |  FROM tc, tot)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CAST(logp AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS mean_logprob
        |FROM terms t JOIN lp ON t.term = lp.term
        |GROUP BY t.doc_id""".stripMargin,

    // F13: same ln-8dp-into-decimal recipe as f9; c is an exact integer
    // multiplier so the cross-term sum is decimal-exact in both engines.
    "f13_token_entropy" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM terms GROUP BY 1, 2),
        |ag AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         sum(CAST(round(ln(c), 8) AS DECIMAL(18,8)) * c) AS sclnc
        |  FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       round(ln(n_tokens), 8) - CAST(sclnc AS DOUBLE) / n_tokens AS entropy
        |FROM ag""".stripMargin,

    // F14: the four pinned lns assemble in DECIMAL before the integer
    // scale-up, so the Σ is exact; only the final ratio is a double.
    "f14_source_kl" ->
      """WITH terms AS (
        |  SELECT source, unnest(str_split(text, ' ')) AS term FROM documents),
        |st AS (SELECT source, term, count(*) AS c_st FROM terms GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ct),
        |contrib AS (
        |  SELECT st.source,
        |         (CAST(round(ln(c_st), 8) AS DECIMAL(18,8))
        |          - CAST(round(ln(n_s), 8) AS DECIMAL(18,8))
        |          - CAST(round(ln(c_t), 8) AS DECIMAL(18,8))
        |          + CAST(round(ln(n), 8) AS DECIMAL(18,8))) * c_st AS contrib,
        |         n_s
        |  FROM st JOIN ns ON st.source = ns.source
        |          JOIN ct ON st.term = ct.term, tot)
        |SELECT source, max(n_s) AS n_tokens,
        |       CAST(sum(contrib) AS DOUBLE) / max(n_s) AS kl_div
        |FROM contrib GROUP BY source""".stripMargin,

    "f10_keywords" ->
      s"""SELECT doc_id, term, tfidf, rnk FROM (
         |  SELECT doc_id, term, tfidf,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY tfidf DESC, term) AS rnk
         |  FROM ($tfidfSql))
         |WHERE rnk <= 5""".stripMargin,

    "f7_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS t FROM documents),
        |base AS (
        |  SELECT doc_id,
        |         CAST(len(t) AS BIGINT) AS n_tokens,
        |         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
        |  FROM toks WHERE len(t) >= 2),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram),
        |gs AS (
        |  SELECT doc_id, max(c) AS top_gram_count, CAST(sum(c) AS BIGINT) AS n_grams
        |  FROM gc GROUP BY doc_id)
        |SELECT base.doc_id, n_tokens, n_distinct,
        |       CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_ratio,
        |       coalesce(top_gram_count, CAST(0 AS BIGINT)) AS top_gram_count,
        |       coalesce(n_grams, CAST(0 AS BIGINT)) AS n_grams,
        |       CASE WHEN coalesce(n_grams, 0) > 0
        |            THEN CAST(coalesce(top_gram_count, 0) AS DOUBLE) / coalesce(n_grams, 0)
        |            ELSE CAST(0.0 AS DOUBLE) END AS top_gram_frac,
        |       (CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens) > 0.8
        |       OR (CASE WHEN coalesce(n_grams, 0) > 0
        |            THEN CAST(coalesce(top_gram_count, 0) AS DOUBLE) / coalesce(n_grams, 0)
        |            ELSE CAST(0.0 AS DOUBLE) END) > 0.1 AS is_repetitive
        |FROM base LEFT JOIN gs ON base.doc_id = gs.doc_id""".stripMargin,

    "f8_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact ' || source || '@example.com from 10.0.' ||
        |         CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-' ||
        |         CAST(1000 + doc_id % 9000 AS VARCHAR) AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '[A-Za-z0-9]+@[A-Za-z0-9]+\.[A-Za-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(pii_text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(pii_text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(pii_text,
        |    '[A-Za-z0-9]+@[A-Za-z0-9]+\.[A-Za-z]+', '<EMAIL>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM p""".stripMargin,
    "f6_tfidf" -> tfidfSql,
    "f5_normalize" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         str_split(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'), ' ') AS tok
        |  FROM documents)
        |SELECT doc_id,
        |       array_to_string(list_filter(tok,
        |         w -> w NOT IN ('the','a','of','and','in','to','is','')), ' ') AS normalized,
        |       CAST(len(list_filter(tok,
        |         w -> w NOT IN ('the','a','of','and','in','to','is',''))) AS BIGINT) AS n_kept
        |FROM tk""".stripMargin,

    "f1_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(str_split(text, ' '), w -> w IN ('the','a','of','and','in','to','is'))) AS en_hits,
        |    len(list_filter(str_split(text, ' '), w -> w IN ('el','la','de','y','los','que','un'))) AS es_hits,
        |    len(list_filter(str_split(text, ' '), w -> w IN ('de5','shi4','le5','zai4','he2','you3','wo3'))) AS zh_hits
        |  FROM documents)
        |SELECT doc_id, lang, en_hits, es_hits, zh_hits,
        |  CASE WHEN en_hits >= es_hits AND en_hits >= zh_hits THEN 'en'
        |       WHEN es_hits >= zh_hits THEN 'es' ELSE 'zh' END AS pred_lang,
        |  (CASE WHEN en_hits >= es_hits AND en_hits >= zh_hits THEN 'en'
        |        WHEN es_hits >= zh_hits THEN 'es' ELSE 'zh' END) = lang AS is_match
        |FROM scored""".stripMargin,

    "f2_quality" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_m,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS punct_chars,
        |    CAST(len(list_filter(str_split(text, ' '), w -> w IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS stop_hits,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars
        |  FROM documents)
        |SELECT doc_id, n_chars_m, n_tokens, punct_chars, stop_hits, word_chars,
        |  CASE WHEN n_chars_m > 0 THEN CAST(punct_chars AS DOUBLE) / n_chars_m
        |       ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
        |  CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
        |  CAST(word_chars AS DOUBLE) / n_tokens AS avg_word_len,
        |  least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
        |    + (CAST(stop_hits AS DOUBLE) / n_tokens) * CAST(0.3 AS DOUBLE)
        |    + (CAST(1.0 AS DOUBLE) - CASE WHEN n_chars_m > 0
        |         THEN CAST(punct_chars AS DOUBLE) / n_chars_m
        |         ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE) AS quality_score
        |FROM m""".stripMargin,

    "f3_token_count" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens,
        |  CAST(ceil(length(text) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS est_tokens
        |FROM documents""".stripMargin,

    "f4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(str_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(str_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 1024 AS shard
        |FROM documents""".stripMargin
  )
}
