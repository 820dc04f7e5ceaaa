package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Streaming corpus-curation gate — the admission filter a training-data
  * ingest runs on every arriving document micro-batch:
  *
  *  1. exact-duplicate drop keyed on the content digest, bounded by the
  *     watermark (state GC'd past the horizon);
  *  2. quality floor (minimum token count — the cheap row-local gate;
  *     richer scoring composes the same way);
  *  3. benchmark decontamination against a STATIC eval set, carried as
  *     a Bloom filter over the set's 8-word shingles and broadcast as a
  *     literal (~KBs): each arriving doc probes its own grams against
  *     the sketch with `exists`, entirely row-local — no join, no
  *     shuffle, no per-batch state. False positives over-BLOCK (the
  *     safe direction for leakage — a clean doc is occasionally
  *     rejected, a contaminated one never admitted).
  *
  * Everything is row-local or watermark-bounded, so the gate sustains
  * arbitrary stream volume; the one driver-side step is collecting the
  * bounded benchmark sketch once at plan-build time.
  */
object CurationStream {

  /** Build the benchmark-shingle Bloom sketch (bounded driver value).
    * Returns None for an empty/gram-less benchmark — no contamination
    * gate in that case.
    */
  def benchmarkGramBloom(benchmark: DataFrame, n: Int = 8,
                         numBits: Long = 1 << 20): Option[Array[Byte]] = {
    // row guard + _outer: same drop-out (short docs gram to nothing),
    // no inferred filter re-running the gram build in the scan
    // (§6b round-15)
    val grams = benchmark
      .select(split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= n)
      .select(
        transform(sequence(lit(1), size(col("tok")) - (n - 1)),
          i => array_join(slice(col("tok"), i, lit(n)), " ")).as("grams"))
      .select(explode_outer(col("grams")).as("gram"))
    val row = grams
      .agg(BloomFunctions.bloomFilterAgg(col("gram"), 100000L, numBits).as("bf"))
      .head()
    Option(row.getAs[Array[Byte]]("bf"))
  }

  /** H11: streaming embedding near-dup gate — the vector-space twin of
    * the text gate: each arriving embedding is LSH-bucketed (the same
    * md5-portable hyperplanes as the batch dedup path), stream-static
    * LEFT-ANTI joined to the bucketed STATIC corpus on the bucket key
    * with an in-bucket exact-cosine residual, and admitted only when no
    * corpus neighbor exceeds `threshold`. Append-mode with no watermark
    * or state: stream-static anti joins keep nothing across batches,
    * the static side is planned once, and per-row work is O(bucket
    * size), never O(corpus). Recall is the LSH bucket recall — high for
    * true near-duplicates (small angles rarely cross a hyperplane);
    * raise `bits` for smaller buckets or lower it for better recall.
    * Zero-norm arrivals are dropped (no defined direction to compare).
    */
  def embedNearDupGate(stream: DataFrame, corpus: DataFrame,
                       threshold: Double = 0.9, bits: Int = 6): DataFrame = {
    val corpusSide = Similarity.withNorm(corpus)
      .withColumn("bucket", Similarity.lshBucket(col("embedding"), bits))
      .select(col("embedding").as("c_emb"), col("nrm").as("c_nrm"),
        col("bucket").as("c_bucket"))
    val streamSide = Similarity.withNorm(stream)
      .withColumn("bucket", Similarity.lshBucket(col("embedding"), bits))
    streamSide.join(corpusSide,
        col("bucket") === col("c_bucket") &&
          Similarity.dot(col("embedding"), col("c_emb")) /
            (col("nrm") * col("c_nrm")) > threshold,
        "left_anti")
      .drop("nrm", "bucket")
  }

  /** H29: streaming syntactic near-dup admission — the text-sketch
    * member of the gate family (H19 exact digest, H11 embedding
    * cosine, this: MinHash/LSH): each arriving doc computes its
    * 16-hash signature ROW-LOCALLY (the batch d2 sketch path via the
    * native expression), then FOUR stream-static EQUI anti joins —
    * one per band, each against that band's slice of the static
    * corpus band table — drop the doc when a band collision ALSO
    * passes the exact 3-shingle Jaccard verify (d4's statistic,
    * spelled as the integer cross-size test inside the join condition
    * so no aggregation state is ever needed; an OR-of-bands single
    * join would plan as a nested loop — the per-band chain keeps
    * every probe hash-joinable). Stateless: anti joins hold nothing
    * across batches, the static side plans once and in production is
    * the PERSISTED d18 band table (A12-bucketed on the band key)
    * joined to the corpus shingle store. Recall is the LSH band
    * recall exactly as in the batch candidate path — a pair at
    * Jaccard ≥ t that no band catches is missed here too (d21's
    * S-curves price that trade); sub-3-token docs carry no syntactic
    * evidence and are admitted.
    */
  def syntacticNearDupGate(stream: DataFrame, corpus: DataFrame,
                           tNum: Int = 7, tDen: Int = 10): DataFrame = {
    val corpusBands = Dedup.lshBands(corpus)
      .join(corpus.select(col("doc_id"),
        array_distinct(Dedup.shingles(Dedup.tokens(col("text")))).as("c_sh")),
        Seq("doc_id"))
    val withSig = stream
      .withColumn("tok", Dedup.tokens(col("text")))
      .withColumn("sh_pos", when(size(col("tok")) >= 3,
        Dedup.shingles(col("tok"))).otherwise(array().cast("array<string>")))
      .withColumn("sh", array_distinct(col("sh_pos")))
      .withColumn("mh", when(size(col("sh_pos")) > 0,
        graft.functions.MinHashFunctions.minhashSig(col("sh_pos")))
        .otherwise(lit(null).cast("array<bigint>")))
    (0 until 4).foldLeft(withSig) { (acc, j) =>
      val cb = corpusBands.filter(col("band_id") === j)
        .select(col("band_key").as(s"c_bk$j"), col("c_sh"))
      val myKey = concat_ws("-",
        element_at(col("mh"), j * 4 + 1), element_at(col("mh"), j * 4 + 2),
        element_at(col("mh"), j * 4 + 3), element_at(col("mh"), j * 4 + 4))
      val inter = size(array_intersect(col("sh"), col("c_sh")))
      acc.join(cb,
        col("mh").isNotNull && myKey === col(s"c_bk$j") &&
          inter * tDen >= (size(col("sh")) + size(col("c_sh")) - inter) * tNum,
        "left_anti")
    }.drop("tok", "sh_pos", "sh", "mh")
  }

  /** H19: stream-vs-corpus exact-dup admission — the incremental D1:
    * each arriving document's content digest is anti-joined against the
    * STATIC corpus digest table (in production the persisted D1 output,
    * bucketed on the digest so the stream side's per-batch join probes
    * are co-located reads). Stream-static anti joins hold no state
    * across batches and the static side plans once, so the gate
    * sustains any stream volume; in-stream duplicates are still caught
    * by H10's watermarked dropDuplicates upstream — the two compose as
    * (H10 ∘ H19), exactly how a production ingest layers "new vs
    * corpus" and "new vs new".
    */
  def corpusDedupGate(stream: DataFrame, corpusDigests: DataFrame): DataFrame =
    stream.withColumn("content_hash", md5(col("text")))
      .join(corpusDigests.select(col("content_hash")), Seq("content_hash"), "left_anti")

  /** H18: streaming Gopher admission gate — the F15 rule battery
    * applied to every arriving micro-batch. `gopherRules` is a pure
    * row-local projection, so the IDENTICAL batch code plans as a
    * streaming map: the gate is stateless (no watermark, no state
    * store, no shuffle), sustains any stream volume at scan speed, and
    * the decision columns are bit-exact with the batch F15 pass by
    * construction — asserted in the parity spec (the H12–H17 pattern:
    * stream == batch at the doubleToLongBits level), not assumed.
    * Returns every scored document; downstream sinks filter on
    * `passes_gopher` (kept as a column so rejects can be routed to a
    * quarantine sink — the A10 dead-letter discipline).
    */
  def gopherGate(docs: DataFrame): DataFrame =
    TextAnalysis.gopherRules(docs)

  /** H24: streaming boilerplate-span strip — F22's rewrite applied at
    * ingest: every arriving document is cleaned against the
    * corpus-derived template list BEFORE admission, so downstream
    * training shards never see the recurring chrome. The template set
    * is a bounded MODEL (C17's rules-as-data; H10's benchmark-sketch
    * discipline) collected once at plan-build time and shipped as a
    * literal — the gate itself is [[TextAnalysis.stripWithTemplates]]'s
    * pure row-local projection chain: stateless, no watermark, no
    * shuffle, sustains any stream volume at scan speed. Batch parity
    * is bit-exact BY CONSTRUCTION (identical code path) and asserted
    * against `boilerplateStrip` in the parity spec — the H18 pattern.
    */
  def spanStripGate(docs: DataFrame, templates: Seq[String],
                    n: Int = 4): DataFrame =
    TextAnalysis.stripWithTemplates(docs, templates, n)

  /** H25: streaming dead-air screen — G12 applied at media ingest:
    * each arriving item is scored (flat-frame count/fraction, longest
    * flat run) the moment it lands, so the curation sink can quarantine
    * dead-air uploads before they reach a training shard. G12's
    * row-local rewrite is what makes this free: every frame of an item
    * lives in its one payload row and the longest-run recurrence is an
    * in-row fold, so the IDENTICAL batch code plans as a stateless
    * streaming projection (H18's class — no watermark, no state, no
    * shuffle, scan speed at any volume). Batch parity is bit-exact by
    * construction and asserted in the parity spec.
    */
  def flatFrameGate(media: DataFrame, frameBytes: Int = 64,
                    maxDistinct: Int = 15): DataFrame =
    graft.operators.Multimodal.flatFrames(media, frameBytes, maxDistinct)

  /** The gate: admitted documents only, with the token count attached.
    * `docs` must carry (doc_id, ts, text); duplicates share identical
    * text. Stage layout follows the one-HOF-stage-per-projection rule.
    */
  def curationGate(docs: DataFrame, benchBloom: Option[Array[Byte]],
                   minTokens: Int = 5, gramN: Int = 8,
                   watermark: String = "10 minutes"): DataFrame = {
    val contaminated: Column = benchBloom match {
      case Some(bytes) =>
        exists(col("grams"), g => BloomFunctions.mightContain(lit(bytes), g))
      case None => lit(false)
    }
    docs
      .withWatermark("ts", watermark)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("tok", split(col("text"), " "))
      .withColumn("grams",
        when(size(col("tok")) >= gramN,
          transform(sequence(lit(1), size(col("tok")) - (gramN - 1)),
            i => array_join(slice(col("tok"), i, lit(gramN)), " ")))
          .otherwise(array().cast("array<string>")))
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .filter(col("n_tokens") >= minTokens && !contaminated)
      .select(col("doc_id"), col("ts"), col("text"), col("n_tokens"))
  }
}
