package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Profile}

/** Corpus-curation operators (SURVEY §2 D11, I8, I9): benchmark
  * decontamination, deterministic mixture sampling, sequence packing.
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  test("D11 contamination flags shared 8-grams, excludes self, skips short docs") {
    import spark.implicits._
    val bench = Seq((100L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "x0 w1 w2 w3 w4 w5 w6 w7 w8 tail", // shares exactly 1 gram (w1..w8)
      2L -> "a b c d e f g h i",               // disjoint vocabulary
      3L -> "short text",                      // < 8 words -> no grams
      4L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9",      // identical -> both grams hit
      100L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9"     // the benchmark doc itself: self-excluded
    ).toDF("doc_id", "text")
    val r = Dedup.contaminationReport(corpus, bench).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hit_grams"), x.getAs[Boolean]("contaminated"))).toMap
    assert(r(1L) === ((1L, true)))
    assert(r(2L) === ((0L, false)))
    assert(r(3L) === ((0L, false)))
    assert(r(4L) === ((2L, true)))
    assert(r(100L) === ((0L, false)), "a benchmark doc must not be flagged by its own grams")
    assert(r.size === 5, "report must cover every corpus doc")
  }

  test("D11 separate-id-space benchmark: equal ids must NOT suppress hits") {
    import spark.implicits._
    // eval set with its own id space: id 1 collides with an UNRELATED corpus doc
    val bench = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 x9", // contaminated AND id-collides
      2L -> "a b c d e f g h"
    ).toDF("doc_id", "text")
    val r = Dedup.contaminationReport(corpus, bench, benchmarkFromCorpus = false)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("contaminated")).toMap
    assert(r(1L) === true, "id collision across independent id spaces suppressed a real hit")
    assert(r(2L) === false)
    // the corpus-subset default keeps self-exclusion
    val sub = Dedup.contaminationReport(corpus, corpus.filter($"doc_id" === 1L))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("contaminated")).toMap
    assert(sub(1L) === false)
  }

  test("D12 dup-span scoring: identical docs score 1.0, disjoint 0.0, partial counted exactly") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i").mkString(" ")
    val x = (1 to 20).map(i => s"x$i").mkString(" ")
    // first 10 words shared with doc 1, back half unique
    val half = ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"y$i")).mkString(" ")
    val docs = Seq(1L -> w, 2L -> w, 3L -> x, 4L -> half).toDF("doc_id", "text")
    val r = Dedup.dupSpanScore(docs).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Double]("dup_ratio") === 1.0)
    assert(!r(1L).getAs[Boolean]("keep"), "a fully-duplicated doc must be flagged")
    assert(r(2L).getAs[Double]("dup_ratio") === 1.0)
    assert(r(3L).getAs[Double]("dup_ratio") === 0.0)
    assert(r(3L).getAs[Boolean]("keep"))
    // exactly the 3 grams fully inside the shared w1..w10 prefix are dups
    assert(r(4L).getAs[Long]("n_grams") === 13L)
    assert(r(4L).getAs[Long]("dup_grams") === 3L)
    assert(r(4L).getAs[Boolean]("keep"))
  }

  test("D12b aggregate+broadcast plan reproduces the window plan exactly") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i").mkString(" ")
    val half = ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"y$i")).mkString(" ")
    val docs = Seq(1L -> w, 2L -> w, 3L -> half).toDF("doc_id", "text")
    val win = Dedup.dupSpanScore(docs).collect().map(_.toSeq).toSet
    val agg = Dedup.dupSpanScoreAgg(docs).collect().map(_.toSeq).toSet
    assert(win === agg, "the two physical plans must agree row-for-row")
  }

  test("D13 winnowing: shared >= n+w-1 run guarantees a shared fingerprint; selection shrinks storage") {
    import spark.implicits._
    // an 11-token (= n+w-1) run shared between two otherwise-disjoint docs
    val run = (1 to 11).map(i => s"r$i").mkString(" ")
    val a = run + " " + (1 to 15).map(i => s"a$i").mkString(" ")
    val b = (1 to 15).map(i => s"b$i").mkString(" ") + " " + run
    val c = (1 to 30).map(i => s"c$i").mkString(" ") // no shared run
    val sets = Dedup.winnowSets(Seq(1L -> a, 2L -> b, 3L -> c).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet)).toMap
    sets.foreach { case (id, (gh, fp)) =>
      assert(fp.subsetOf(gh), s"doc $id selected a fingerprint not among its gram hashes")
      assert(fp.nonEmpty && fp.size <= gh.size)
    }
    assert((sets(1L)._2 intersect sets(2L)._2).nonEmpty,
      "the winnowing guarantee: an 11-token shared run must share a selected fingerprint")
    assert((sets(1L)._2 intersect sets(3L)._2).isEmpty)
    // storage cut on the corpus: mean reduction must beat keeping every gram
    val red = Dedup.winnowFingerprints(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
      .map(_.getAs[Double]("reduction"))
    assert(red.sum / red.length < 0.6,
      f"mean stored fraction ${red.sum / red.length}%.2f — expected ~2/(w+1)=0.4")
  }

  test("I12 uniform sample: exactly k rows, deterministic, top-k plan (no global sort)") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val s1 = Profile.uniformSampleK(docs, k = 37)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must not be a full sort\n$plan")
    val r1 = s1.collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(r1.length === 37)
    val r2 = Profile.uniformSampleK(docs, k = 37).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(r1 === r2, "the sample must be identical across runs")
  }

  test("I16 stratified-k: min(k, stratum size) rows per stratum, pruned plan, deterministic") {
    import org.apache.spark.sql.functions.{col, count, least, lit}
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val s1 = Profile.stratifiedK(docs, "lang", k = 20)
    // per-partition pruning: row_number <= k compiles to WindowGroupLimit
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-stratum top-k must prune before the shuffle\n$plan")
    // exactly min(k, |stratum|) from every stratum
    val got = s1.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val want = docs.groupBy(col("lang"))
      .agg(least(count(lit(1)), lit(20L)).as("n"))
    assert(got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      want.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // deterministic across runs
    val ids1 = s1.collect().map(_.getAs[Long]("doc_id")).toSet
    val ids2 = Profile.stratifiedK(docs, "lang", k = 20).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids1 === ids2)
  }

  test("I11 token budget keeps exactly the greedy hash-order prefix per source") {
    import spark.implicits._
    val docs = (1L to 50L)
      .map(i => (i, s"src${i % 2}", Seq.fill((i % 7 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val kept = Profile.tokenBudgetCap(docs, budget = 20L).collect()
    kept.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("cum_tokens")).max <= 20L, s"$src over budget")
    }
    // the kept set IS the prefix of the unbounded admission order at <= budget
    val full = Profile.tokenBudgetCap(docs, budget = Long.MaxValue).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_tokens")))
    assert(full.length === 50, "unbounded budget must admit every doc")
    val expected = full.filter(_._3 <= 20L).map(t => (t._1, t._2)).toSet
    assert(kept.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
      === expected)
  }

  test("I8 mixture sampling honors 0 and 100 percent exactly and is deterministic") {
    import spark.implicits._
    val docs = (1L to 300L)
      .map(i => (i, s"src${i % 3}", s"text $i")).toDF("doc_id", "source", "text")
    val r = Profile.mixtureSample(docs,
      Map("src0" -> 100, "src1" -> 0), defaultPct = 50).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_total"), x.getAs[Long]("n_kept"))).toMap
    assert(r("src0") === ((100L, 100L)))
    assert(r("src1") === ((100L, 0L)))
    val (t2, k2) = r("src2")
    assert(t2 === 100L && k2 > 20L && k2 < 80L, s"50% target landed at $k2/100")
    // content-hash gating: a re-run keeps the identical rows
    val again = Profile.mixtureSample(docs,
      Map("src0" -> 100, "src1" -> 0), defaultPct = 50).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("n_kept")).toMap
    assert(again("src2") === k2)
  }

  test("I9 sequence packing: running offsets within a shard, cut at the budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t t t t"),      // 4 tokens, prior 0  -> seq 0 offset 0
      (2L, "t t t t t"),    // 5 tokens, prior 4  -> seq 0 offset 4
      (3L, "t t t"),        // 3 tokens, prior 9  -> seq 0 offset 9
      (4L, "t t")           // 2 tokens, prior 12 -> seq 1 offset 2
    ).toDF("doc_id", "text")
    val r = Profile.packSequences(docs, budget = 10, shards = 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("seq_id"), x.getAs[Long]("seq_offset"))).toMap
    assert(r(1L) === ((0L, 0L)))
    assert(r(2L) === ((0L, 4L)))
    assert(r(3L) === ((0L, 9L)))
    assert(r(4L) === ((1L, 2L)))
    // sharding: each shard packs independently from offset 0
    val sharded = Profile.packSequences(docs, budget = 10, shards = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("shard"), x.getAs[Long]("seq_offset"))).toMap
    assert(sharded(1L) === ((1L, 0L))) // shard 1: docs 1,3 -> priors 0,4
    assert(sharded(3L) === ((1L, 4L)))
    assert(sharded(2L) === ((0L, 0L))) // shard 0: docs 2,4 -> priors 0,5
    assert(sharded(4L) === ((0L, 5L)))
  }

  test("I23 shard manifest: counts match the packing; checksum is arrival-order invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "t t t t"), (2L, "t t t t t"), (3L, "t t t"), (4L, "t t")
    ).toDF("doc_id", "text")
    val m = Profile.shardManifest(docs, budget = 10, shards = 2).collect()
      .map(x => x.getAs[Long]("shard") -> x).toMap
    // shard 1: docs 1,3 (4+3=7 tokens, 1 seq); shard 0: docs 2,4 (5+2=7)
    assert(m(1L).getAs[Long]("n_docs") === 2L)
    assert(m(1L).getAs[Long]("shard_tokens") === 7L)
    assert(m(1L).getAs[Long]("n_seqs") === 1L)
    assert(m(0L).getAs[Long]("min_doc") === 2L && m(0L).getAs[Long]("max_doc") === 4L)
    assert(m.values.map(_.getAs[Double]("token_share")).sum === 1.0)
    // n_seqs = ceil(tokens/budget): 11 tokens over budget 10 -> 2 seqs
    val m2 = Profile.shardManifest(docs, budget = 10, shards = 1).collect()
    assert(m2.head.getAs[Long]("n_seqs") === 2L)
    // checksum: XOR of doc hashes — permuting arrival order (and the
    // partitioning that follows it) cannot change it
    val fwd = Profile.shardManifest(docs, budget = 10, shards = 2).collect()
      .map(x => x.getAs[Long]("shard") -> x.getAs[Long]("checksum")).toMap
    val rev = Profile.shardManifest(
      docs.orderBy(col("doc_id").desc).repartition(3), budget = 10, shards = 2)
      .collect()
      .map(x => x.getAs[Long]("shard") -> x.getAs[Long]("checksum")).toMap
    assert(fwd === rev)
    // and it actually discriminates: dropping a doc changes the shard's sum
    val dropped = Profile.shardManifest(docs.filter(col("doc_id") =!= 3L),
      budget = 10, shards = 2).collect()
      .map(x => x.getAs[Long]("shard") -> x.getAs[Long]("checksum")).toMap
    assert(dropped(1L) !== fwd(1L))
    assert(dropped(0L) === fwd(0L), "untouched shard's checksum must not move")
  }

  test("I24 manifest diff: all four statuses classified; only touched shards flag on the corpus") {
    import spark.implicits._
    def m(rows: (Long, Long, Long, Long)*) =
      rows.toDF("shard", "n_docs", "shard_tokens", "checksum")
    val prev = m((0L, 2L, 100L, 7L), (1L, 3L, 200L, 9L), (3L, 1L, 50L, 4L))
    val cur = m((0L, 2L, 100L, 7L), (1L, 3L, 200L, 11L), (2L, 4L, 80L, 5L))
    val d = graft.operators.Profile.manifestDiff(cur, prev).collect()
      .map(r => r.getAs[Long]("shard") ->
        ((r.getAs[String]("status"), r.getAs[Long]("docs_delta"),
          r.getAs[Long]("tokens_delta")))).toMap
    assert(d(0L) === (("unchanged", 0L, 0L)))
    assert(d(1L) === (("changed", 0L, 0L)),
      "a checksum move with equal counts is still a change")
    assert(d(2L) === (("added", 4L, 80L)))
    assert(d(3L) === (("removed", -1L, -50L)))
    // the corpus query: docs removed from shards 0–2 only ⇒ exactly
    // those three changed, every other shard byte-identical
    val q = graft.operators.Profile.queries("i24_manifest_diff")(spark, SF)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[String]("status")).toMap
    assert(q.filter(_._2 == "changed").keySet === Set(0L, 1L, 2L), q.toString)
    assert(q.count(_._2 == "unchanged") === 29)
  }

  test("I17 weighted sample: exact k, top-k plan, deterministic, length-biased vs uniform") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val s1 = Profile.weightedSampleK(docs, k = 50)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted top-k must not be a full sort\n$plan")
    val r1 = s1.collect()
    assert(r1.length === 50)
    assert(r1.forall(_.getAs[Long]("n_chars") > 0L))
    val r2 = Profile.weightedSampleK(docs, k = 50).collect()
    assert(r1.map(_.getAs[Long]("doc_id")).toSeq ===
      r2.map(_.getAs[Long]("doc_id")).toSeq, "replayable across runs")
    // the point of weighting: longer docs are overrepresented relative
    // to the uniform hash sample on the SAME corpus (deterministic
    // fixture, so this is a fixed fact, not a statistical flake)
    val wMean = r1.map(_.getAs[Long]("n_chars")).sum.toDouble / r1.length
    val uni = Profile.uniformSampleK(docs, k = 50).collect()
    val uMeanRows = docs.filter(col("doc_id").isin(
      uni.map(_.getAs[Long]("doc_id")).toSeq: _*))
      .select(col("n_chars")).collect().map(_.getLong(0))
    val uMean = uMeanRows.sum.toDouble / uMeanRows.length
    assert(wMean > uMean,
      f"length-weighted mean $wMean%.1f must exceed uniform mean $uMean%.1f")
  }

  test("I18 source profile: complete, shares sum to 1, dominant language is a real argmax") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val rows = Profile.sourceProfile(docs).collect()
    assert(rows.length === docs.select("source").distinct().count())
    val fracSum = rows.map(_.getAs[Double]("corpus_frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-9, s"shares sum to $fracSum")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // spot-check the argmax for one source against a direct count
    val src0 = rows.head.getAs[String]("source")
    val want = docs.filter(col("source") === src0)
      .groupBy(col("lang")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, c) => (-c, l) }.head._1
    assert(rows.head.getAs[String]("top_lang") === want)
  }

  test("I19 mixture weights: sqrt flattening, exact normalization, budget floor") {
    import spark.implicits._
    // source A: 9 tokens, source B: 1 token → sqrt gives 3:1, so the
    // flattened mix is 75/25 where the raw share would be 90/10
    val docs = Seq(
      (1L, "w w w w w", "A"),
      (2L, "w w w w", "A"),
      (3L, "w", "B")).toDF("doc_id", "text", "source")
    val out = Profile.mixtureWeights(docs, budgetTokens = 1000000L).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"),
          r.getAs[Long]("alloc_tokens")))).toMap
    assert(out("A") === ((9L, 0.75, 750000L)))
    assert(out("B") === ((1L, 0.25, 250000L)))
    // upsampled vs raw share, but never above the dominant source
    assert(out("B")._2 > 0.1 && out("B")._2 < out("A")._2)
    // exact normalization on the real corpus too (the fold makes the
    // normalizer deterministic, so the weights are replayable)
    val real = Profile.mixtureWeights(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
    val totalW = real.map(_.getAs[Double]("weight")).sum
    assert(math.abs(totalW - 1.0) < 1e-12)
    assert(real.map(_.getAs[Long]("alloc_tokens")).sum <= 1000000L)
  }

  test("I21 epoch plan: surplus allocation caps into shortfall, uncapped sources spend their allocation") {
    import spark.implicits._
    // i19's hand case (9:1 tokens → 75/25 weights) at budget 40:
    // A allocates 30 over 9 tokens → 3.33 epochs, under the 4.0 cap;
    // B allocates 10 over 1 token → 10 raw epochs, capped at 4 → plans
    // 4 tokens and surfaces a 6-token shortfall for redistribution
    val docs = Seq(
      (1L, "w w w w w", "A"),
      (2L, "w w w w", "A"),
      (3L, "w", "B")).toDF("doc_id", "text", "source")
    val out = Profile.epochPlan(docs, budgetTokens = 40L).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Double]("epochs"),
          r.getAs[Boolean]("capped"), r.getAs[Long]("planned_tokens"),
          r.getAs[Long]("shortfall_tokens")))).toMap
    assert(out("A") === ((30L, 30.0 / 9.0, false, 30L, 0L)))
    assert(out("B") === ((10L, 4.0, true, 4L, 6L)))
    // real-corpus invariants: epochs never exceed the cap, a capped
    // source always shows positive shortfall, an uncapped one spends
    // its allocation to within the floor rounding unit
    val real = Profile.epochPlan(
      graft.sources.Tables.table(spark, SF, "documents"), 100000L).collect()
    real.foreach { r =>
      assert(r.getAs[Double]("epochs") <= 4.0)
      assert(r.getAs[Long]("planned_tokens") <= r.getAs[Long]("alloc_tokens"))
      if (r.getAs[Boolean]("capped"))
        assert(r.getAs[Long]("shortfall_tokens") > 0L)
      else assert(r.getAs[Long]("shortfall_tokens") <= 1L)
    }
  }

  test("I22 dedup-aware weights: copies buy no mass; clean sources keep the i19 weights") {
    import spark.implicits._
    // source A: a doc duplicated once (5 tokens twice) + a clean 4-token
    // doc → raw 14, unique 9; source B: 1 token. Unique-token sqrt mix
    // = 3:1 → 75/25, identical to the i19 hand case — the duplicate
    // changed NOTHING because only the keeper counts.
    val docs = Seq(
      (1L, "w w w w w", "A"),
      (2L, "w w w w w", "A"), // exact dup of 1 → not a keeper
      (3L, "w w w w", "A"),
      (4L, "w", "B")).toDF("doc_id", "text", "source")
    val out = Profile.dedupAwareMixtureWeights(docs, budgetTokens = 1000000L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens_raw"), r.getAs[Long]("n_tokens_unique"),
          r.getAs[Double]("weight"), r.getAs[Long]("alloc_tokens")))).toMap
    assert(out("A") === ((14L, 9L, 0.75, 750000L)))
    assert(out("B") === ((1L, 1L, 0.25, 250000L)))
    // real corpus: unique <= raw everywhere, weights normalize exactly
    val real = Profile.dedupAwareMixtureWeights(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
    real.foreach(r => assert(
      r.getAs[Long]("n_tokens_unique") <= r.getAs[Long]("n_tokens_raw")))
    assert(math.abs(real.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-12)
    // the synthetic corpus has NEAR-dups but no byte-exact dups, so
    // i22 must degenerate to i19 exactly — the composition is sound
    // only if the no-dup fixed point holds bit-for-bit
    val i19 = Profile.mixtureWeights(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    real.foreach { r =>
      assert(r.getAs[Long]("n_tokens_unique") === r.getAs[Long]("n_tokens_raw"))
      assert(r.getAs[Double]("weight") === i19(r.getAs[String]("source")))
    }
  }

  test("I20 curriculum order: band = clamped f2 decile, per-(band,shard) ranks contiguous, replayable") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val out = Profile.curriculumOrder(docs).collect()
    assert(out.length === docs.count())
    // band recomputed from the f2 score it rode in with
    out.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      val want = math.min(9L, math.floor(q * 10).toLong)
      assert(r.getAs[Long]("band") === want)
      assert(r.getAs[Long]("shard") >= 0L && r.getAs[Long]("shard") < 64L)
    }
    // positions are 1..n within every (band, shard) slice — a loader can
    // stream any slice independently
    out.groupBy(r => (r.getAs[Long]("band"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ===
          (1L to rows.length).toSeq)
      }
    // replayable: a second plan yields the identical layout
    val again = Profile.curriculumOrder(docs).collect()
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("band"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(keyed(out) === keyed(again))
  }

  test("I13b keeper split: cluster-atomic, keeper is the cluster argmax, consistent with i13 and d16") {
    val q = SparkEntry.queries("i13b_keeper_split")(spark, SF).collect()
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    assert(q.length.toLong === docs.count(), "every document is assigned")
    // (a) no near-dup pair straddles a boundary: the split is a pure
    // function of cluster_id, so every cluster member shares it —
    // transitively covering every candidate pair
    q.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length === 1,
        s"cluster $cid members landed in different splits")
      // (b) exactly one keeper per cluster and it is the
      // (quality_score DESC, doc_id) argmax — the production contract:
      // filter(split='train' AND is_keeper) trains on each train
      // cluster's best copy
      val kept = rows.filter(_.getAs[Boolean]("is_keeper"))
      assert(kept.length === 1, s"cluster $cid must keep exactly one copy")
      val best = rows.minBy(r =>
        (-r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id")))
      assert(kept.head.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"),
        s"cluster $cid keeper is not the quality argmax")
    }
    // (c) the composition changes NOTHING about its inputs: splits
    // equal i13's row-for-row, keeper flags equal d16's
    val i13 = SparkEntry.queries("i13_leakage_safe_split")(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val d16 = SparkEntry.queries("d16_quality_keeper")(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_keeper")).toMap
    q.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("split") === i13(id))
      assert(r.getAs[Boolean]("is_keeper") === d16(id))
    }
  }
}
