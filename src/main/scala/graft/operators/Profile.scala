package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Cols._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Dataset profiling — the pre-load audit every warehouse load and every
  * training-data refresh runs first: row counts, null rates, distinct
  * cardinalities, numeric/temporal ranges. One pass, all measures as a
  * single aggregation (no per-column jobs), so a 100 TB table profiles
  * at scan speed with one tiny result row.
  */
object Profile {

  /** Deterministic train/val/test assignment by content-independent key
    * hash: stable across runs, engines, and cluster sizes (the property
    * a reproducible training pipeline needs — rng-based splits are not
    * replayable). 80/10/10 by md5 bucket of the id.
    */
  def splitAssign(df: DataFrame, idCol: String): DataFrame = {
    val bucket = graft.functions.HashFunctions
      .md5Prefix60(col(idCol).cast("string")) % 100
    df.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
  }

  /** Expectation-style constraint audit: each rule evaluates to one row
    * (constraint, observed, passed). Single-table rules share one
    * aggregation pass; the referential rule is a left-anti count. The
    * report is what gates a load before MERGE — at 100 TB every rule is
    * still one scan + scalar, nothing collected.
    */
  def qualityAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val single = orders.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("o_custkey"))).as("custkey_nulls"),
      countDistinct(col("o_orderkey")).as("orderkey_distinct"))
    val orphans = lineitem
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val discounts = lineitem.agg(
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1L)
        .otherwise(0L)).as("n_bad_discount"))
    single.crossJoin(orphans).crossJoin(discounts).select(
      explode(array(
        struct(lit("custkey_not_null").as("constraint"),
          col("custkey_nulls").cast("long").as("observed"),
          (col("custkey_nulls") === 0).as("passed")),
        struct(lit("orderkey_unique").as("constraint"),
          (col("n_rows") - col("orderkey_distinct")).cast("long").as("observed"),
          (col("n_rows") === col("orderkey_distinct")).as("passed")),
        struct(lit("lineitem_fk_orders").as("constraint"),
          col("n_orphans").cast("long").as("observed"),
          (col("n_orphans") === 0).as("passed")),
        struct(lit("discount_in_range").as("constraint"),
          col("n_bad_discount").cast("long").as("observed"),
          (col("n_bad_discount") === 0).as("passed")))).as("c"))
      .select(col("c.constraint"), col("c.observed"), col("c.passed"))
  }

  /** I8: deterministic mixture sampling — hit a target per-source rate
    * (the domain-mixing step that rebalances web/books/code before
    * training) by keeping a row iff its salted md5 bucket falls under
    * the source's percentage. Content-hash gating, not rng: replayable
    * across runs/engines/cluster sizes, and independent of the
    * [[splitAssign]] buckets thanks to the salt. Pure scan + one
    * map-side-combined aggregation for the report.
    */
  def mixtureSample(docs: DataFrame, rates: Map[String, Int],
                    defaultPct: Int,
                    stratumCol: String = "source",
                    idCol: String = "doc_id"): DataFrame = {
    val bucket = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("mix:"), col(idCol).cast("string"))) % 100
    val target = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct): org.apache.spark.sql.Column) {
      case (acc, (src, pct)) => when(col(stratumCol) === src, lit(pct)).otherwise(acc)
    }
    docs
      .select(col(stratumCol), target.as("target_pct"),
        (bucket < target).as("keep"))
      .groupBy(col(stratumCol), col("target_pct"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("achieved_frac",
        round(col("n_kept").cast("double") / col("n_total"), 8))
  }

  /** I9: sequence packing (concat-and-chunk) — assign each document its
    * start position in fixed-token-budget training sequences, packed in
    * doc_id order WITHIN a shard. Sharding keeps the running-sum window
    * partitioned (never a global single-partition sort — the b24
    * anti-pattern); each shard packs independently, which is exactly how
    * a 100 TB corpus packs on 1000 executors. Token counts use the
    * whitespace tokenizer (F3); a doc may straddle a boundary — this is
    * the GPT-style concatenate-then-cut layout, not per-sequence bin
    * packing.
    */
  def packSequences(docs: DataFrame, budget: Int = 512,
                    shards: Int = 32): DataFrame =
    packSequencesFrom(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budget, shards)

  /** [[packSequences]] over an EXPLICIT (doc_id, n_tokens) relation —
    * the tokenizer seam: i9 feeds it whitespace counts, i9b feeds it
    * F24's learned-vocab counts, and the packing algebra (sharding,
    * running sum, boundary math) exists exactly once.
    */
  def packSequencesFrom(counts: DataFrame, budget: Int = 512,
                        shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        col("n_tokens"))
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("prior") / budget).cast("long").as("seq_id"),
        (col("prior") % budget).as("seq_offset"))
  }

  /** I23: training-shard manifest — the per-shard summary a training
    * job reads to PLAN a run over I9-packed shards without scanning
    * them: document/sequence/token counts, the doc-id span, each
    * shard's token share of the corpus, and an ORDER-INDEPENDENT
    * content checksum (bit_xor of salted 60-bit doc hashes — XOR is
    * commutative and cannot overflow, so any partitioning, replay
    * order, or cluster size yields the same value; the integrity
    * analogue of A13's row-count audit at manifest granularity, and
    * the cheap "did the shard change" test an incremental rebuild
    * needs).
    *
    * Scale: one corpus pass (narrow projection: shard, token count,
    * hash — the token array never materializes past the expression)
    * into a `shards`-sized aggregate. The per-shard table is
    * checkpointed BEFORE the corpus-total branch reads it: the total
    * is the psiFromCells scalar-aggregate + broadcast crossJoin idiom,
    * and without the checkpoint the pruned-column total branch would
    * get a canonically different exchange and re-scan the corpus (the
    * §6b round-8 pruning/reuse trap — here the shared subplan is
    * 32 rows, so materializing it is free and exact).
    */
  /** Shared I23/H23 projection: (doc_id, shard, n_tokens, hv). The
    * batch manifest and the streaming maintenance path MUST derive
    * these through this one expression set (the H13 shared-arithmetic
    * rule) or the checksums silently diverge.
    */
  def shardObservations(docs: DataFrame, shards: Int = 32): DataFrame =
    docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      graft.functions.HashFunctions
        .md5Prefix60(concat(lit("man:"), col("doc_id").cast("string")))
        .as("hv"))

  def shardManifest(docs: DataFrame, budget: Int = 512,
                    shards: Int = 32): DataFrame = {
    val per = shardObservations(docs, shards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(hv)").as("checksum"))
      .localCheckpoint(true)
    val tot = per.agg(sum(col("shard_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("shard_tokens"),
        expr(s"(shard_tokens + ${budget - 1}) div $budget").as("n_seqs"),
        col("min_doc"), col("max_doc"), col("checksum"),
        (col("shard_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("token_share"))
  }

  /** I24: shard-manifest diff — the incremental-rebuild trigger I23's
    * checksum exists for: given the CURRENT and PREVIOUS manifests
    * (persisted |shards|-row tables in production — the diff never
    * touches the corpus), classify each shard `added` / `removed` /
    * `changed` / `unchanged` and report the doc/token deltas. A
    * rebuild pipeline re-packs ONLY the changed shards; on a 100 TB
    * store where a daily load touches a few shards, that is the
    * difference between re-processing terabytes and re-processing the
    * delta. `unchanged` requires the checksum AND both counts to
    * agree — the counts are free to compare and shrink the (already
    * hash-collision-sized) false-unchanged surface. Full-outer on the
    * shard key; all outputs exact longs plus one string status.
    */
  def manifestDiff(current: DataFrame, previous: DataFrame): DataFrame = {
    val c = current.select(col("shard"), col("n_docs").as("docs_new"),
      col("shard_tokens").as("tokens_new"), col("checksum").as("ck_new"))
    val p = previous.select(col("shard"), col("n_docs").as("docs_old"),
      col("shard_tokens").as("tokens_old"), col("checksum").as("ck_old"))
    c.join(p, Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("docs_old").isNull, lit("added"))
          .when(col("docs_new").isNull, lit("removed"))
          .when(col("ck_new") === col("ck_old") &&
            col("docs_new") === col("docs_old") &&
            col("tokens_new") === col("tokens_old"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        (coalesce(col("docs_new"), lit(0L)) - coalesce(col("docs_old"), lit(0L)))
          .as("docs_delta"),
        (coalesce(col("tokens_new"), lit(0L)) - coalesce(col("tokens_old"), lit(0L)))
          .as("tokens_delta"))
  }

  /** I10: deterministic global shuffle — the randomize-before-training
    * pass. Each row's position is a pure function of its id (salted
    * md5): hash → shard, rank within shard by (hash, id). Replayable on
    * any engine/cluster size, no rng state; the per-shard rank window is
    * partitioned (never a global single-partition sort), and shards can
    * be written as the training files directly.
    */
  def globalShuffle(docs: DataFrame, idCol: String = "doc_id",
                    shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("shuf:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("hv"), col(idCol))
    docs
      .select(col(idCol), h.as("hv"))
      .withColumn("shard", pmod(col("hv"), lit(shards.toLong)))
      .select(col(idCol), col("shard"),
        row_number().over(w).as("pos"))
  }

  /** I11: per-source token-budget cap — the "take N tokens from each
    * domain" step that turns a raw corpus + a mixture recipe into an
    * actual training set (the token-count analogue of I8's row-percent
    * sampling: budgets are TOKENS, the unit recipes are written in).
    * Docs are admitted in salted-hash order (an unbiased, replayable
    * stand-in for random order) until the source's cumulative token
    * count passes `budget`; the greedy prefix is deterministic on any
    * engine/cluster size.
    *
    * Scale shape: one narrow projection (token count = split size,
    * never materializing the token array past the expression), one
    * window partitioned BY SOURCE. Source count is typically thousands
    * (domains), so partitions parallelize; a single mega-source making
    * one hot window partition is the known limit — mitigation is the
    * I9-style sharded running sum with per-shard sub-budgets.
    */
  /** Shared I11/H14 projection: (doc_id, source, n_tokens, hk). Both
    * the batch cap and the streaming gate MUST tokenize and hash through
    * this one expression set, or the admission orders silently diverge
    * (the training-serving-skew trap H13 closes for features, applied
    * to admission).
    */
  /** The I11/H14 admission-order salt as one expression — every
    * consumer (whitespace obs, i11b's learned-vocab obs, the H14
    * stream gate) MUST hash through this or admission orders silently
    * diverge.
    */
  private[graft] def tokenAdmissionHash: Column =
    graft.functions.HashFunctions
      .md5Prefix60(concat(lit("tok:"), col("doc_id").cast("string")))

  def tokenObservations(docs: DataFrame): DataFrame = {
    // op-specific salt ("tok:"), like every sibling sampler ("mix:" I8,
    // "shuf:" I10, "samp:" I12): an unsalted doc_id hash would make this
    // op's admission order perfectly correlated with any other consumer
    // of the raw hash order
    docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      tokenAdmissionHash.as("hk"))
  }

  def tokenBudgetCap(docs: DataFrame, budget: Long = 800L): DataFrame =
    tokenBudgetCapFrom(tokenObservations(docs), budget)

  /** [[tokenBudgetCap]] over an EXPLICIT (doc_id, source, n_tokens,
    * hk) relation — the same tokenizer seam as [[packSequencesFrom]]:
    * the greedy hash-order prefix admission exists once, whatever
    * counted the tokens.
    */
  def tokenBudgetCapFrom(obs: DataFrame, budget: Long = 800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    obs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** I12: exact-k deterministic uniform sample — "give me exactly 100
    * documents, unbiased, and the same 100 on every run/engine/cluster
    * size". Rank = salted content hash ⇒ uniform over the corpus;
    * global top-k by (hash, id) compiles to TakeOrderedAndProject —
    * each partition keeps its local k, the driver merges k-sized heaps —
    * NEVER a global sort (compare `ORDER BY rand() LIMIT k`, which is
    * neither deterministic nor rank-stable). The replayable form of
    * "sample k rows for eval/inspection" at any corpus size.
    */
  def uniformSampleK(docs: DataFrame, k: Int = 100,
                     idCol: String = "doc_id"): DataFrame = {
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("samp:"), col(idCol).cast("string")))
    docs
      .select(col(idCol), col("source"), h.as("hk"))
      .orderBy(col("hk"), col(idCol))
      .limit(k)
  }

  /** I25: mergeable exact-k sample maintenance — [[uniformSampleK]]
    * re-derived as BOTTOM-K SKETCH ALGEBRA: each shard keeps its own
    * k smallest (hk, id) rows independently, the ≤ shards·k survivors
    * union, and one re-cut of the union's bottom-k returns EXACTLY
    * the one-shot corpus sample (the global k smallest are each
    * smallest within their own shard — the law PropertySpec seals
    * bit-exactly at several shard counts, the f23b merge-twin
    * pattern). This is what makes the i12 sample maintainable at
    * 100 TB: per-day/per-datacenter slices sample locally at ingest,
    * a k·shards-row merge — never a corpus rescan — refreshes the
    * global sample, and retiring a slice re-merges the survivors.
    *
    * Plan: one scan; the per-shard rank compiles to WindowGroupLimit
    * (per-partition pruning to k before the shard exchange), and the
    * close is a TakeOrderedAndProject over the ≤ shards·k union —
    * O(k) on the wire regardless of corpus size.
    */
  def sampleMergeK(docs: DataFrame, k: Int = 100, shards: Int = 4,
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("samp:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("hk"), col(idCol))
    docs
      .select(col(idCol), col("source"), h.as("hk"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("source"), col("hk"))
      .orderBy(col("hk"), col(idCol))
      .limit(k)
  }

  /** I17: deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis 2006): each row draws u ∈ (0,1] from a salted
    * md5 hash and takes key = −ln(u)/w — order-equivalent to the
    * textbook u^(1/w) but with no exp() (ln at 8 dp has libm-parity;
    * exp does not, §6b). The k SMALLEST keys are the sample, so heavier
    * rows (weight = n_chars: importance ∝ document length) win
    * proportionally — the replayable form of importance sampling for
    * mixture construction. orderBy+limit compiles to
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on
    * the driver — no global sort, no full shuffle, O(k) on the wire at
    * any corpus size.
    */
  def weightedSampleK(docs: DataFrame, k: Int = 100,
                      idCol: String = "doc_id"): DataFrame = {
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("wrs:"), col(idCol).cast("string")))
    docs
      .filter(col("n_chars") > 0)
      .select(col(idCol), col("source"), col("n_chars"),
        pmod(h, lit(1073741824L)).as("hv"))
      // no outer round: −ln(u)8 / w is identical-IEEE-ops-on-identical-
      // inputs in both engines; an outer round can land on a true
      // decimal tie when w = 2^a·5^b (§6b, the f13 lesson)
      .withColumn("wkey",
        -round(log((col("hv") + 1).cast("double") / lit(1073741824.0)), 8)
          / col("n_chars").cast("double"))
      .select(col(idCol), col("source"), col("n_chars"), col("wkey"))
      .orderBy(col("wkey"), col(idCol))
      .limit(k)
  }

  /** I18: per-source dataset card — the grouped governance twin of the
    * corpus-wide I1 profile: doc/char volumes, language spread, the
    * deterministic dominant language (count desc, lang asc — Spark's
    * mode() is nondeterministic on ties, b41's lesson), and each
    * source's share of the corpus. Two keyed aggregates (source;
    * source×lang — the second is ≤|sources|×|langs| rows) plus a
    * broadcast 1-row corpus total; ratios ship unrounded (§6b).
    */
  def sourceProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val top = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    base.join(top, Seq("source")).crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("total_chars"),
        (col("total_chars").cast("double") / col("n_docs")).as("mean_chars"),
        col("n_langs"), col("top_lang"),
        (col("n_docs").cast("double") / col("n_total")).as("corpus_frac"))
  }

  /** I16: exact-k-per-stratum deterministic sample — "exactly k docs
    * from EVERY language", the per-group form of I12 (I3's hash
    * stratifier takes per-stratum FRACTIONS; this takes counts — the
    * eval-set builder's contract). rank = row_number over (salted
    * hash, id) within the stratum; `rnk <= k` compiles to
    * WindowGroupLimit, so each partition keeps only its local k per
    * stratum BEFORE the stratum shuffle — the wire carries
    * O(k × strata × partitions) rows, never the corpus.
    */
  def stratifiedK(docs: DataFrame, strataCol: String = "lang",
                  k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("strk:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(col("hk"), col("doc_id"))
    docs.select(col("doc_id"), col(strataCol), h.as("hk"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col(strataCol), col("rnk"))
  }

  /** I16/I26 shared oracle (a def so both entries use one string). */
  /** I9/I9b shared oracle generator: the sharded running-sum packing
    * close over a caller-supplied `d(doc_id, shard, n_tokens)` CTE
    * block — the SQL mirror of [[packSequencesFrom]]'s tokenizer seam.
    */
  private def i9PackSql(withBlock: String): String =
    s"""WITH $withBlock,
       |p AS (
       |  SELECT doc_id, shard, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (
       |           PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
       |  FROM d)
       |SELECT doc_id, shard, n_tokens,
       |       CAST(prior // 512 AS BIGINT) AS seq_id,
       |       CAST(prior % 512 AS BIGINT) AS seq_offset
       |FROM p""".stripMargin

  /** I11/I11b shared oracle generator: the greedy hash-order budget
    * admission over a caller-supplied `d(doc_id, source, n_tokens,
    * hk)` CTE block — [[tokenBudgetCapFrom]]'s seam in SQL.
    */
  private def i11BudgetSql(withBlock: String): String =
    s"""WITH $withBlock,
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id) AS BIGINT)
       |           AS cum_tokens
       |  FROM d)
       |SELECT doc_id, source, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 800""".stripMargin

  private def stratifiedKOracleSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |         CAST(('0x' || substr(md5('strk:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
      |  FROM documents)
      |SELECT doc_id, lang,
      |       row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rnk
      |FROM h
      |QUALIFY rnk <= 20""".stripMargin

  /** I26: mergeable exact-k-per-stratum sample — [[stratifiedK]]
    * through [[sampleMergeK]]'s bottom-k algebra applied WITHIN each
    * stratum: every shard keeps its own k smallest (hk, id) per
    * stratum, the ≤ strata·shards·k survivors union, and the
    * per-stratum re-cut equals the one-shot i16 sample exactly (the
    * i25 law, per group — each stratum's global k smallest are each
    * smallest within their own shard). Same salt as i16, so the two
    * share ONE oracle verbatim (the b38 merge-twin pattern), and the
    * maintenance story transfers: per-slice eval sets refresh the
    * per-language sample from k·shards rows per stratum, never a
    * corpus rescan. Both rank cuts compile to WindowGroupLimit; only
    * the strata·shards·k survivors reach the stratum exchange.
    */
  def stratifiedMergeK(docs: DataFrame, strataCol: String = "lang",
                       k: Int = 20, shards: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("strk:"), col("doc_id").cast("string")))
    val perShard = Window.partitionBy(col(strataCol), col("shard"))
      .orderBy(col("hk"), col("doc_id"))
    val merged = Window.partitionBy(col(strataCol))
      .orderBy(col("hk"), col("doc_id"))
    docs.select(col("doc_id"), col(strataCol), h.as("hk"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
      .withColumn("rk", row_number().over(perShard))
      .filter(col("rk") <= k)
      .withColumn("rnk", row_number().over(merged).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col(strataCol), col("rnk"))
  }

  /** I19: temperature-scaled source-mixture weights — the multilingual/
    * multi-domain sampling formula (mBERT/XLM-R exponent α = 0.5):
    * w_s = n_s^α / Σ_t n_t^α, flattening the source distribution so
    * low-resource sources are upsampled relative to their raw share.
    * α = 0.5 is computed as sqrt — IEEE-754 correctly-rounded on every
    * engine, unlike a general pow(x, α) which is libm-dependent (§6b:
    * estimators stick to + − × ÷ sqrt). Each source's token allocation
    * from a fixed budget goes through floor (the §6b cast-parity rule).
    *
    * The only corpus pass is the per-source token count (map-side
    * combined, |sources| rows out). The normalizer is a deterministic
    * LEFT FOLD of the per-source sqrt terms in source order — a SUM()
    * over doubles would be partition-order-dependent; |sources| is
    * governance-bounded (thousands at most), so the one-row fold is
    * trivially cheap at any corpus scale.
    */
  def mixtureWeights(docs: DataFrame, budgetTokens: Long = 1000000L): DataFrame = {
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("sq", sqrt(col("n_tokens").cast("double")))
    val tot = perSource
      .agg(sort_array(collect_list(struct(col("source"), col("sq")))).as("a"))
      .select(expr(
        "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.sq)").as("total_sq"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        (col("sq") / col("total_sq")).as("weight"))
      .withColumn("alloc_tokens", floor(col("weight") * lit(budgetTokens)))
  }

  /** I21: per-source epoch/repetition plan — the scheduling step
    * between mixture weights and a training run: each source's
    * temperature-scaled token allocation ([[mixtureWeights]], reused
    * verbatim so the two reports cannot drift) is converted into
    * EPOCHS over that source's actual tokens, capped at `maxEpochs`
    * (repeating a small source beyond a few epochs stops buying
    * quality — the data-constrained-scaling rule of thumb — so the
    * cap turns surplus allocation into a visible shortfall instead of
    * silent over-repetition). Reported per source: the raw epoch
    * demand, the capped plan, planned tokens (floor — §6b cast
    * parity), and the shortfall a re-weighting pass could redistribute.
    *
    * Arithmetic is the |sources|-row closing algebra on top of i19's
    * fold: two double divisions, one least(), one multiply, one floor
    * — IEEE-identical across engines, so the plan carries a full
    * oracle. The only corpus pass is i19's per-source token count.
    */
  def epochPlan(docs: DataFrame, budgetTokens: Long = 1000000L,
                maxEpochs: Double = 4.0): DataFrame =
    mixtureWeights(docs, budgetTokens)
      .withColumn("epochs_raw",
        col("alloc_tokens").cast("double") / col("n_tokens").cast("double"))
      .withColumn("epochs", least(lit(maxEpochs), col("epochs_raw")))
      .withColumn("capped", col("epochs_raw") > lit(maxEpochs))
      .withColumn("planned_tokens",
        floor(col("epochs") * col("n_tokens").cast("double")))
      .withColumn("shortfall_tokens",
        col("alloc_tokens") - col("planned_tokens"))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("alloc_tokens"), col("epochs_raw"), col("epochs"),
        col("capped"), col("planned_tokens"), col("shortfall_tokens"))

  /** I20: curriculum ordering — the band-then-shuffle layout curriculum
    * training readers consume: each doc gets a quality band (its F2
    * score bucketed into `bands` levels; floor + clamp, §6b cast
    * parity) and a deterministic position inside (band, shard) — the
    * loader walks bands high-to-low and streams shards in parallel,
    * which is exactly I10's sharded-window trick applied per band: NO
    * global sort exists anywhere, each window orders one
    * (band, shard) slice, so the plan scales like the shuffle that
    * feeds it. Salted-md5 in-band order keeps the schedule replayable
    * across runs, engines, and cluster sizes.
    */
  def curriculumOrder(docs: DataFrame, bands: Int = 10,
                      shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score"))
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("curr:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("band"), col("shard"))
      .orderBy(col("hv"), col("doc_id"))
    q.select(col("doc_id"), col("quality_score"), h.as("hv"))
      .withColumn("band",
        least(lit(bands - 1L), floor(col("quality_score") * bands)))
      .withColumn("shard", pmod(col("hv"), lit(shards.toLong)))
      .select(col("doc_id"), col("quality_score"), col("band"), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  /** I22: dedup-aware mixture weights — I19 run on the corpus D1 would
    * keep ("dedup before weighting"): duplicate-heavy sources otherwise
    * buy sampling mass with copies, exactly the bias exact-dedup exists
    * to remove. Per source: raw token count, unique token count (only
    * each content hash's keeper counts), and the sqrt-temperature
    * weight/allocation computed over UNIQUE tokens. The keeper
    * restriction is a digest groupBy (D1's single shuffle) semi-joined
    * back — at 100 TB both legs ride the same digest partitioning.
    */
  def dedupAwareMixtureWeights(docs: DataFrame,
                               budgetTokens: Long = 1000000L): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      md5(col("text")).as("content_hash"))
    val keepers = toks.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val raw = toks.groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens_raw"))
    val unique = toks.join(keepers, Seq("content_hash", "doc_id"), "left_semi")
      .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("sq", sqrt(col("n_tokens").cast("double")))
    val tot = unique
      .agg(sort_array(collect_list(struct(col("source"), col("sq")))).as("a"))
      .select(expr(
        "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.sq)").as("total_sq"))
    unique.join(raw, Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens_raw"),
        col("n_tokens").as("n_tokens_unique"),
        (col("sq") / col("total_sq")).as("weight"))
      .withColumn("alloc_tokens", floor(col("weight") * lit(budgetTokens)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // I22: mixture weights over the deduped corpus (D1 ∘ I19).
    "i22_dedup_mixture" -> ((s, d) =>
      dedupAwareMixtureWeights(Tables.table(s, d, "documents"))),

    // I19: sqrt-temperature mixture weights + budget allocation.
    "i19_mixture_weights" -> ((s, d) =>
      mixtureWeights(Tables.table(s, d, "documents"))),

    // I21: per-source epoch/repetition plan (i19's allocation → capped
    // epochs + shortfall). Budget pinned to 100k here (operator default
    // 1M, matching mixtureWeights'): at sf0.01 that caps 2 of 20
    // sources, so BOTH branches of the least()/capped logic are
    // oracle-exercised — a larger budget caps everything and the plan
    // degenerates.
    "i21_epoch_plan" -> ((s, d) =>
      epochPlan(Tables.table(s, d, "documents"), budgetTokens = 100000L)),

    // I20: quality-banded curriculum layout (F2 score + sharded order).
    "i20_curriculum_order" -> ((s, d) =>
      curriculumOrder(Tables.table(s, d, "documents"))),

    // I16: exact-k per stratum (WindowGroupLimit per-partition pruning).
    "i16_stratified_k" -> ((s, d) =>
      stratifiedK(Tables.table(s, d, "documents"))),

    // I26: i16 via per-(stratum, shard) bottom-k + a per-stratum
    // re-cut — the i25 merge law per group; equals i16 exactly.
    "i26_stratified_merge" -> ((s, d) =>
      stratifiedMergeK(Tables.table(s, d, "documents"))),

    // I12: exact-k deterministic uniform sample (global top-k by hash).
    "i12_uniform_sample_k" -> ((s, d) =>
      uniformSampleK(Tables.table(s, d, "documents"))),

    // I25: the i12 sample via per-shard bottom-k + a k·shards-row
    // merge — the maintainable-at-scale form; equals i12 exactly.
    "i25_sample_merge" -> ((s, d) =>
      sampleMergeK(Tables.table(s, d, "documents"))),

    // I17: deterministic weighted (length-proportional) sample.
    "i17_weighted_sample" -> ((s, d) =>
      weightedSampleK(Tables.table(s, d, "documents"))),

    // I18: per-source dataset card (grouped governance profile).
    "i18_source_profile" -> ((s, d) =>
      sourceProfile(Tables.table(s, d, "documents"))),

    // I11: per-source token-budget cap (greedy hash-order prefix).
    "i11_token_budget" -> ((s, d) =>
      tokenBudgetCap(Tables.table(s, d, "documents"))),

    // I10: deterministic global shuffle for training-order assignment.
    "i10_global_shuffle" -> ((s, d) =>
      globalShuffle(Tables.table(s, d, "documents"))),

    // I8: deterministic per-source mixture sampling report.
    "i8_mixture_sample" -> ((s, d) =>
      mixtureSample(Tables.table(s, d, "documents"),
        Map("src0" -> 80, "src5" -> 50, "src10" -> 25), defaultPct = 10)),

    // I9: fixed-budget sequence packing (sharded running sum).
    "i9_pack_sequences" -> ((s, d) =>
      packSequences(Tables.table(s, d, "documents"))),

    // I9b: i9's packing driven by F24's LEARNED-VOCAB counts — the
    // unit a real training run budgets in, through the same seam.
    "i9b_pack_bpe" -> ((s, d) => packSequencesFrom(
      TextAnalysis.bpeSegment(Tables.table(s, d, "documents"))
        .select(col("doc_id"), col("bpe_tokens").as("n_tokens")))),

    // I11b: i11's greedy budget admission on learned-vocab counts
    // (same salt, same order — only the token unit changes).
    "i11b_budget_bpe" -> ((s, d) => tokenBudgetCapFrom(
      TextAnalysis.bpeSegment(Tables.table(s, d, "documents"),
        carry = Seq("source"))
        .select(col("doc_id"), col("source"),
          col("bpe_tokens").as("n_tokens"),
          tokenAdmissionHash.as("hk")))),

    // I23: per-shard training manifest over the i9 shard layout.
    "i23_shard_manifest" -> ((s, d) =>
      shardManifest(Tables.table(s, d, "documents"))),

    // I24: manifest diff — the previous load drops every 5th doc from
    // shards 0–2 only, so the diff must flag exactly those three shards
    // changed and the other 29 unchanged (both branches exercised).
    "i24_manifest_diff" -> ((s, d) => {
      val docs = Tables.table(s, d, "documents")
      manifestDiff(shardManifest(docs),
        shardManifest(docs.filter(
          !(pmod(col("doc_id"), lit(32L)) < 3L &&
            pmod(col("doc_id"), lit(5L)) === 0L))))
    }),

    // I5: expectation-style data-quality audit over the load tables.
    "i5_quality_audit" -> ((s, d) =>
      qualityAudit(Tables.table(s, d, "orders"), Tables.table(s, d, "lineitem"))),

    // I2: deterministic dataset split + per-split counts.
    "i2_split" -> ((s, d) =>
      splitAssign(Tables.table(s, d, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
             max(col("doc_id")).as("max_id"))),

    // I3: stratified sampling by language (per-stratum fractions via
    // sampleBy; rng-based ⇒ rows-only, fraction tolerance in the spec).
    "i3_stratified_sample" -> ((s, d) =>
      Tables.table(s, d, "documents")
        .stat.sampleBy("lang",
          Map("en" -> 0.5, "es" -> 0.25, "zh" -> 0.1), seed = 42L)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))),

    // I3b: the deterministic twin of I3 — same strata and fractions,
    // gated by a salted content hash instead of rng, so the sample is
    // replayable across runs/retries/engines and hash-matches an oracle.
    "i3_stratified_hash" -> ((s, d) =>
      mixtureSample(Tables.table(s, d, "documents"),
        Map("en" -> 50, "es" -> 25, "zh" -> 10), defaultPct = 0,
        stratumCol = "lang")),

    "i1_profile" -> ((s, d) =>
      Tables.table(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("o_orderstatus"))).as("status_nulls"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"),
        dsum2(col("o_totalprice")).as("price_sum"),
        fmtTs(min(col("o_orderdate"))).as("date_min"),
        fmtTs(max(col("o_orderdate"))).as("date_max")))
  )

  def oracles: Map[String, String] = Map(
    // I22: d1's digest-keeper restriction + i19's fold recipe; a
    // source left with zero unique docs drops from both sides (inner
    // join on the unique leg).
    "i22_dedup_mixture" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
        |         md5(text) AS content_hash
        |  FROM documents),
        |k AS (
        |  SELECT content_hash, min(doc_id) AS doc_id FROM toks GROUP BY 1),
        |raw AS (
        |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens_raw
        |  FROM toks GROUP BY 1),
        |u AS (
        |  SELECT t.source, CAST(sum(t.n_tok) AS BIGINT) AS n_tokens
        |  FROM toks t JOIN k ON t.content_hash = k.content_hash
        |                    AND t.doc_id = k.doc_id
        |  GROUP BY 1),
        |sq AS (
        |  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sq FROM u),
        |t2 AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(sq ORDER BY source)), (acc, x) -> acc + x) AS total_sq
        |  FROM sq)
        |SELECT s.source, r.n_tokens_raw, s.n_tokens AS n_tokens_unique,
        |       s.sq / t2.total_sq AS weight,
        |       CAST(floor(s.sq / t2.total_sq * 1000000) AS BIGINT) AS alloc_tokens
        |FROM sq s JOIN raw r USING (source), t2""".stripMargin,

    // I19: sqrt is correctly-rounded IEEE on both engines; the
    // normalizer is the same explicit left fold in source order; the
    // allocation goes through floor before the BIGINT cast (§6b).
    // I20: the f2 quality formula verbatim (same literals), the i10
    // md5-prefix hash recipe, floor+least band clamp (§6b cast parity),
    // and per-(band, shard) row_number windows.
    "i20_curriculum_order" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_m,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS punct_chars,
        |    CAST(len(list_filter(str_split(text, ' '),
        |      w -> w IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS stop_hits
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
        |      + (CAST(stop_hits AS DOUBLE) / n_tokens) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - CASE WHEN n_chars_m > 0
        |           THEN CAST(punct_chars AS DOUBLE) / n_chars_m
        |           ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE) AS quality_score
        |  FROM m),
        |h AS (
        |  SELECT doc_id, quality_score,
        |    least(9, CAST(floor(quality_score * 10) AS BIGINT)) AS band,
        |    CAST(('0x' || substr(md5('curr:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM q)
        |SELECT doc_id, quality_score, band, hv % 64 AS shard,
        |       row_number() OVER (PARTITION BY band, hv % 64
        |                          ORDER BY hv, doc_id) AS pos
        |FROM h""".stripMargin,

    "i19_mixture_weights" ->
      """WITH s AS (
        |  SELECT source,
        |         CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |sq AS (
        |  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sq FROM s),
        |t AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(sq ORDER BY source)), (acc, x) -> acc + x) AS total_sq
        |  FROM sq)
        |SELECT source, n_tokens, sq / total_sq AS weight,
        |       CAST(floor(sq / total_sq * 1000000) AS BIGINT) AS alloc_tokens
        |FROM sq, t""".stripMargin,

    // I21: i19's fold + the closing epoch algebra — two double
    // divisions, least(), one multiply, floor; every constant pinned
    // with CAST AS DOUBLE (§6b decimal-literal rule).
    "i21_epoch_plan" ->
      """WITH s AS (
        |  SELECT source,
        |         CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |sq AS (
        |  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sq FROM s),
        |t AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(sq ORDER BY source)), (acc, x) -> acc + x) AS total_sq
        |  FROM sq),
        |w AS (
        |  SELECT source, n_tokens, sq / total_sq AS weight,
        |         CAST(floor(sq / total_sq * 100000) AS BIGINT) AS alloc_tokens
        |  FROM sq, t),
        |e AS (
        |  SELECT source, n_tokens, weight, alloc_tokens,
        |         CAST(alloc_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs_raw
        |  FROM w),
        |p AS (
        |  SELECT source, n_tokens, weight, alloc_tokens, epochs_raw,
        |         least(CAST(4.0 AS DOUBLE), epochs_raw) AS epochs,
        |         epochs_raw > CAST(4.0 AS DOUBLE) AS capped
        |  FROM e)
        |SELECT source, n_tokens, weight, alloc_tokens, epochs_raw, epochs, capped,
        |       CAST(floor(epochs * CAST(n_tokens AS DOUBLE)) AS BIGINT) AS planned_tokens,
        |       alloc_tokens - CAST(floor(epochs * CAST(n_tokens AS DOUBLE)) AS BIGINT)
        |         AS shortfall_tokens
        |FROM p""".stripMargin,
    // I12: same salted hash, same (hk, id) order — the k rows are exact.
    "i12_uniform_sample_k" ->
      """SELECT doc_id, source,
        |       CAST(('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
        |FROM documents
        |ORDER BY hk, doc_id
        |LIMIT 100""".stripMargin,

    // I25: the merge form spelled as it runs — per-shard bottom-k,
    // union, re-cut; the (hk, doc_id) total order makes every
    // boundary deterministic. Equals i12's output by the bottom-k
    // law (PropertySpec seals it in-engine too).
    "i25_sample_merge" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |         CAST(('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk,
        |         doc_id % 4 AS shard
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, hk,
        |         row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id) AS rk
        |  FROM h)
        |SELECT doc_id, source, hk FROM r WHERE rk <= 100
        |ORDER BY hk, doc_id
        |LIMIT 100""".stripMargin,

    // I18: same deterministic top-lang argmax (QUALIFY ↔ row_number),
    // HUGEINT sums cast back to BIGINT, ratios unrounded.
    "i18_source_profile" ->
      """WITH base AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         count(DISTINCT lang) AS n_langs
        |  FROM documents GROUP BY 1),
        |top AS (
        |  SELECT source, lang AS top_lang
        |  FROM (SELECT source, lang, count(*) AS c
        |        FROM documents GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY source
        |                             ORDER BY c DESC, lang) = 1),
        |tot AS (SELECT count(*) AS n_total FROM documents)
        |SELECT base.source, n_docs, total_chars,
        |       CAST(total_chars AS DOUBLE) / n_docs AS mean_chars,
        |       n_langs, top_lang,
        |       CAST(n_docs AS DOUBLE) / n_total AS corpus_frac
        |FROM base JOIN top ON base.source = top.source, tot""".stripMargin,

    // I17: same salted hash, same −round(ln(u),8)/w key, same
    // (wkey, id) total order — the k rows and keys are exact. The
    // divisor literal is spelled identically on both sides; DuckDB's
    // bare-literal division promotes to DOUBLE (§6b: divisions are the
    // safe direction).
    "i17_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(('0x' || substr(md5('wrs:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |           % 1073741824 AS hv
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, source, n_chars,
        |       -round(ln(CAST(hv + 1 AS DOUBLE) / 1073741824.0), 8)
        |         / n_chars AS wkey
        |FROM h
        |ORDER BY wkey, doc_id
        |LIMIT 100""".stripMargin,

    "i16_stratified_k" -> stratifiedKOracleSql,
    // I26 shares i16's oracle VERBATIM: the per-stratum bottom-k merge
    // must reproduce the one-shot stratified sample exactly (the
    // b35/b36/b37/b38 merge-twin pattern, per group).
    "i26_stratified_merge" -> stratifiedKOracleSql,

    // I11: integer token counts, same salted-hash admission order, the
    // cumulative sum windowed identically — the kept prefix is exact.
    "i11_token_budget" -> i11BudgetSql(
      """d AS (
        |  SELECT doc_id, source,
        |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(('0x' || substr(md5('tok:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
        |  FROM documents)""".stripMargin),

    // I11b: the SAME admission close (shared generator) over F24's
    // segmentation CTE — only the token-count column differs.
    "i11b_budget_bpe" -> i11BudgetSql(
      TextAnalysis.bpeSegCte() +
        """,
          |d AS (
          |  SELECT doc_id, source, bpe_tokens AS n_tokens,
          |         CAST(('0x' || substr(md5('tok:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
          |  FROM bpe)""".stripMargin),

    "i10_global_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT doc_id, hv % 64 AS shard,
        |       row_number() OVER (PARTITION BY hv % 64 ORDER BY hv, doc_id) AS pos
        |FROM h""".stripMargin,

    "i3_stratified_hash" ->
      """WITH b AS (
        |  SELECT lang,
        |         CASE WHEN lang = 'en' THEN 50
        |              WHEN lang = 'es' THEN 25
        |              WHEN lang = 'zh' THEN 10 ELSE 0 END AS target_pct,
        |         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT lang, target_pct, count(*) AS n_total,
        |       CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       round(CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 8) AS achieved_frac
        |FROM b GROUP BY lang, target_pct""".stripMargin,

    "i8_mixture_sample" ->
      """WITH b AS (
        |  SELECT source,
        |         CASE WHEN source = 'src0' THEN 80
        |              WHEN source = 'src5' THEN 50
        |              WHEN source = 'src10' THEN 25 ELSE 10 END AS target_pct,
        |         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT source, target_pct, count(*) AS n_total,
        |       CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       round(CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 8) AS achieved_frac
        |FROM b GROUP BY source, target_pct""".stripMargin,

    // I23: i9's shard/token projection, a per-shard group, and the
    // corpus total as a separate scalar CTE (the psiFromCells idiom's
    // SQL mirror). bit_xor is commutative on both engines; token_share
    // is one double division of exact BIGINTs; n_seqs is ceil via
    // integer `//` == Spark `div` on these non-negative values.
    "i23_shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(('0x' || substr(md5('man:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents),
        |per AS (
        |  SELECT shard, count(*) AS n_docs,
        |         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |         min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |         bit_xor(hv) AS checksum
        |  FROM d GROUP BY shard),
        |tot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS total_tokens FROM per)
        |SELECT shard, n_docs, shard_tokens,
        |       CAST((shard_tokens + 511) // 512 AS BIGINT) AS n_seqs,
        |       min_doc, max_doc, checksum,
        |       CAST(shard_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share
        |FROM per, tot""".stripMargin,

    // I24: both manifests from the SHARED d projection (one filtered),
    // the same full-outer shard join and the same status CASE; deltas
    // are exact BIGINT differences.
    "i24_manifest_diff" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(('0x' || substr(md5('man:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents),
        |cur AS (
        |  SELECT shard, count(*) AS docs_new,
        |         CAST(sum(n_tokens) AS BIGINT) AS tokens_new,
        |         bit_xor(hv) AS ck_new
        |  FROM d GROUP BY shard),
        |prev AS (
        |  SELECT shard, count(*) AS docs_old,
        |         CAST(sum(n_tokens) AS BIGINT) AS tokens_old,
        |         bit_xor(hv) AS ck_old
        |  FROM d
        |  WHERE NOT (doc_id % 32 < 3 AND doc_id % 5 = 0)
        |  GROUP BY shard)
        |SELECT coalesce(c.shard, p.shard) AS shard,
        |       CASE WHEN p.shard IS NULL THEN 'added'
        |            WHEN c.shard IS NULL THEN 'removed'
        |            WHEN c.ck_new = p.ck_old AND c.docs_new = p.docs_old
        |                 AND c.tokens_new = p.tokens_old THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |       CAST(coalesce(c.docs_new, 0) - coalesce(p.docs_old, 0) AS BIGINT) AS docs_delta,
        |       CAST(coalesce(c.tokens_new, 0) - coalesce(p.tokens_old, 0) AS BIGINT) AS tokens_delta
        |FROM cur c FULL OUTER JOIN prev p ON c.shard = p.shard""".stripMargin,

    "i9_pack_sequences" -> i9PackSql(
      """d AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)""".stripMargin),

    // I9b: the SAME packing close (shared generator) over F24's
    // segmentation CTE — learned-vocab counts through the i9 seam.
    "i9b_pack_bpe" -> i9PackSql(
      TextAnalysis.bpeSegCte() +
        """,
          |d AS (SELECT doc_id, doc_id % 32 AS shard,
          |             bpe_tokens AS n_tokens FROM bpe)""".stripMargin),

    "i5_quality_audit" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         count(*) - count(o_custkey) AS custkey_nulls,
        |         count(DISTINCT o_orderkey) AS orderkey_distinct
        |  FROM orders),
        |orph AS (
        |  SELECT count(*) AS n_orphans
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |disc AS (
        |  SELECT CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_discount
        |  FROM lineitem)
        |SELECT 'custkey_not_null' AS constraint, custkey_nulls AS observed,
        |       custkey_nulls = 0 AS passed FROM s
        |UNION ALL
        |SELECT 'orderkey_unique', n_rows - orderkey_distinct,
        |       n_rows = orderkey_distinct FROM s
        |UNION ALL
        |SELECT 'lineitem_fk_orders', n_orphans, n_orphans = 0 FROM orph
        |UNION ALL
        |SELECT 'discount_in_range', n_bad_discount, n_bad_discount = 0 FROM disc""".stripMargin,

    "i2_split" ->
      """WITH assigned AS (
        |  SELECT doc_id,
        |         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM assigned GROUP BY split""".stripMargin,

    "i1_profile" ->
      """SELECT count(*) AS n_rows,
        |       count(*) - count(o_orderstatus) AS status_nulls,
        |       count(DISTINCT o_orderstatus) AS status_distinct,
        |       count(DISTINCT o_custkey) AS custkey_distinct,
        |       min(o_totalprice) AS price_min,
        |       max(o_totalprice) AS price_max,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS date_min,
        |       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS date_max
        |FROM orders""".stripMargin
  )
}
