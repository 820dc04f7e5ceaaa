package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Similarity search semantics (SURVEY §2 E1–E2). */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("E9 pre-filtered search returns a full k where post-filtering starves") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val emb = graft.sources.Tables.table(spark, SF, "embeddings")
    val pre = Similarity.filteredCosineTopK(emb, docs, col("lang") === "en", 0L, 20)
      .collect()
    val en = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(pre.length === 20, "pre-filter must rank the FILTERED pool, returning full k")
    assert(pre.forall(r => en.contains(r.getLong(0))), "a result violated the predicate")
    // post-filtering the unfiltered top-k keeps only its en subset...
    val post = Similarity.cosineTopK(emb, 0L, 20).collect()
      .filter(r => en.contains(r.getLong(0)))
    assert(post.length < 20,
      "post-filter starvation did not occur at this SF; predicate too broad for the spec")
    // ...and every survivor is also in the pre-filtered top-k (consistency)
    val preIds = pre.map(_.getLong(0)).toSet
    assert(post.forall(r => preIds.contains(r.getLong(0))))
  }

  test("E10 MMR re-rank: pool-bounded, relevance-led, genuinely diversified") {
    val emb = graft.sources.Tables.table(spark, SF, "embeddings")
    val out = Similarity.mmrDiversify(emb, 0L, 20, 10).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 10)
    val pool = Similarity.cosineTopK(emb, 0L, 20).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score"))
    val poolIds = pool.map(_._1).toSet
    assert(out.forall(r => poolIds.contains(r.getAs[Long]("vec_id"))),
      "MMR selected outside the candidate pool")
    // step 1 is pure relevance: the pool's top-scoring vector
    assert(out.head.getAs[Long]("vec_id") === pool.maxBy(_._2)._1)
    // and its mmr is λ·rel exactly
    assert(out.head.getAs[Double]("mmr") === 0.7 * out.head.getAs[Double]("relevance"))
    // diversification must actually reorder: the MMR sequence differs
    // from the pure-relevance descending order of the same ids
    val byRelevance = out.sortBy(-_.getAs[Double]("relevance")).map(_.getAs[Long]("vec_id")).toSeq
    val byRank = out.map(_.getAs[Long]("vec_id")).toSeq
    assert(byRank !== byRelevance,
      "MMR order equals relevance order — the diversity term did nothing at this SF")
  }

  test("E15 IVF-PQ: candidates come from the probe cells; ADC scores are e8's bit-for-bit") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val out = Similarity.ivfPqTopK(e, 0L, 20).collect()
    assert(out.nonEmpty && out.length <= 20)
    // routing restricts candidates to the query's nProbes=2 cells
    assert(out.map(_.getAs[Int]("cell")).distinct.length <= 2)
    // routing prunes, never rescores: every returned id's ADC score is
    // the full-corpus PQ search's score for that id, bit-for-bit
    val full = Similarity.pqTopK(e, 0L, 1000000).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(full(r.getLong(0))) ===
        java.lang.Double.doubleToLongBits(r.getAs[Double]("score")),
        s"vec ${r.getLong(0)}: ivfpq score diverged from pq")
    }
    // the pruned list is a genuine subset: fewer (or equal) candidates
    // than the unrouted PQ search considered
    assert(out.map(_.getLong(0)).toSet.subsetOf(full.keySet))
  }

  test("E1 exact top-k ranks by cosine") {
    val e = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),  // nearly parallel
      2L -> Seq(0f, 1f, 0f, 0f),      // orthogonal
      3L -> Seq(-1f, 0f, 0f, 0f))     // opposite
    val top = Similarity.cosineTopK(e, 0L, 3).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(top(0).getAs[Double]("score") > 0.99)
    assert(math.abs(top(1).getAs[Double]("score")) < 1e-9)
    assert(top(2).getAs[Double]("score") === -1.0)
  }

  test("E2 ANN finds a same-direction near-duplicate (same LSH bucket by construction)") {
    // A scaled copy of the query has identical hyperplane signs, so it
    // must share the bucket and be returned first.
    val e = vecs(
      0L -> Seq(0.3f, -0.7f, 0.2f, 0.9f),
      1L -> Seq(0.6f, -1.4f, 0.4f, 1.8f), // 2× query: same direction
      2L -> Seq(0.31f, -0.72f, 0.21f, 0.93f)) // tiny perturbation
    val ann = Similarity.annTopK(e, 0L, 5).collect()
    assert(ann.map(_.getLong(0)).contains(1L))
    assert(ann.head.getAs[Double]("score") > 0.999)
  }

  test("E7 SQ8: reconstruction bounded by step/2, high recall vs exact search") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    // per-component reconstruction error ≤ qstep/2 (+ float32 rounding)
    val joined = Similarity.dequantizeSq8(Similarity.quantizeSq8(e))
      .withColumnRenamed("embedding", "deq")
      .join(e, Seq("vec_id"))
      .join(Similarity.quantizeSq8(e).select(col("vec_id"), col("qstep")), Seq("vec_id"))
      .select(
        aggregate(zip_with(col("embedding"), col("deq"),
            (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (m, x) => greatest(m, x)).as("max_err"),
        col("qstep"))
    val bad = joined.filter(col("max_err") > col("qstep") / 2 + 1e-4).count()
    assert(bad === 0L, "reconstruction error exceeded step/2")
    // compressed-corpus search agrees with the exact baseline
    val exact = Similarity.cosineTopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    val sq = Similarity.sq8TopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall vs exact dropped to $recall")
    // codes really are byte-width (the 4x memory claim is structural)
    val codesType = Similarity.quantizeSq8(e).schema("codes").dataType
    assert(codesType.simpleString === "array<tinyint>", codesType.simpleString)
  }

  test("E11 radius search returns exactly the e1-ranked rows at/above the threshold") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val inRange = Similarity.radiusSearch(e, 0L, 0.2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inRange.nonEmpty, "radius 0.2 returned nothing at sf0.001")
    assert(inRange.values.forall(_ >= 0.2))
    // consistency with the exact ranking: every top-k row scoring >= τ
    // is in the radius set with the SAME score (shared arithmetic)
    val topk = Similarity.cosineTopK(e, 0L, 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).filter(_._2 >= 0.2)
    assert(topk.nonEmpty)
    topk.foreach { case (id, s) =>
      assert(inRange.get(id).contains(s), s"vec $id missing or score drifted")
    }
  }

  test("E12 rerank emits exact scores and bounded recall vs the exact top-k") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.cosineTopK(e, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val rr = Similarity.sq8Rerank(e, 0L, 50, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // stage-2 scores are EXACT cosines: any id the two lists share
    // carries bit-identical scores
    val exactMap = exact.toMap
    rr.foreach { case (id, s) =>
      exactMap.get(id).foreach(es => assert(es === s, s"vec $id score drifted"))
    }
    // with a 5x candidate pool the rerank should recover most of the
    // true top-10 (quantization-error-bounded, not guaranteed-perfect)
    val recall = exact.map(_._1).toSet.intersect(rr.map(_._1).toSet).size / 10.0
    assert(recall >= 0.8, s"two-stage recall vs exact dropped to $recall")
  }

  test("E21 PQ refine: ids from the ADC shortlist, exact scores, exact-restricted order") {
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val short = Similarity.pqTopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    val refined = Similarity.pqRefineTopK(e, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(refined.length === 10)
    assert(refined.map(_._1).toSet.subsetOf(short),
      "refine returned an id outside the ADC shortlist")
    // exact-score contract: each refined score is bit-identical to the
    // exact cosine for that id (shared dot/norm arithmetic with e1)
    val exactAll = Similarity.cosineTopK(e, 0L, Int.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    refined.foreach { case (id, s) =>
      assert(exactAll(id) === s, s"vec $id refined score drifted from exact")
    }
    // order contract: the refined list IS the exact ranking restricted
    // to the shortlist — ADC's ordering has no residual influence
    val want = short.toSeq.map(id => id -> exactAll(id))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(refined === want)
  }

  test("E21 property: kShort covering the corpus degenerates refine to the exact top-k") {
    // the accuracy knob's limit, sealed at the doubleToLongBits level:
    // a corpus-wide shortlist makes the ADC stage pure routing noise
    // and the result IS e1 (the kShort→∞ end of the PQ↔exact dial)
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count().toInt
    val exact = Similarity.cosineTopK(e, 0L, 10).collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toSeq
    val refined = Similarity.pqRefineTopK(e, 0L, 10, kShort = n).collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toSeq
    assert(refined === exact)
  }

  test("E22 persisted PQ refine: id-pruned sidecar gather, results equal the in-plan refine bit-exactly") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("graft_pqrefine_idx")
    Similarity.buildPqRefineIndex(e, dir)
    val qVec = e.filter(col("vec_id") === 0L).select("embedding")
      .head.getSeq[Float](0).toArray
    val got = Similarity.searchPqRefineIndex(spark, dir, qVec, 10,
      excludeVecId = Some(0L))
    val gotRows = got.collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toSeq
    val want = Similarity.pqRefineTopK(e, 0L, 10).collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toSeq
    assert(gotRows === want, "persisted serve must equal the in-plan refine")
    // the gather's id set must reach the parquet reader as a pushed
    // filter — the "float corpus never fully materializes" proof
    val p = got.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("In(vec_id"),
      s"the kShort-id In filter must push to the sidecar scan\n$p")
  }

  test("E2 ANN recall vs E1 on real embeddings is measurable and bounded") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val exact = Similarity.cosineTopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(e, 0L, 20).collect()
    assert(ann.length <= 20)
    val scores = ann.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores must be ranked")
    val recall = ann.map(_.getLong(0)).count(exact.contains) / 20.0
    info(s"ANN recall@20 = $recall over ${ann.length} bucket candidates")
  }

  test("E5 batch kNN join agrees with per-query exact top-k") {
    val e = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(-1f, 0f, 0f, 0f),
      4L -> Seq(0.5f, 0.5f, 0f, 0f))
    val batch = Similarity.knnJoin(e, Seq(0L, 2L), 3).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rnk")).map(_.getLong(1)).toSeq }
    for (q <- Seq(0L, 2L)) {
      val solo = Similarity.cosineTopK(e, q, 3).collect().map(_.getLong(0)).toSeq
      assert(batch(q) === solo, s"query $q")
    }
  }

  test("E6 persisted IVF index probes match in-memory IVF and prune partitions") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val dir = tmpDir("graft_ivf_idx")
    graft.operators.Similarity.buildIvfIndex(e, dir)
    val probed = graft.operators.Similarity.probeIvfIndex(spark, dir, 0L, 20)
    val inMem = graft.operators.Similarity.ivfTopK(e, 0L, 20)
    val pr = probed.collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    val im = inMem.collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    assert(pr.map(_._1).toSeq === im.map(_._1).toSeq)
    pr.zip(im).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
    // the probe plan prunes to the probed cell partitions
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("E17 batch IVF-PQ join equals the per-query IVF-PQ searches bit-for-bit") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val joined = Similarity.ivfPqKnnJoin(e, 0L until 8L, 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
    assert(joined.keySet === (0L until 8L).toSet,
      s"every query must get results (got ${joined.keySet})")
    Seq(0L, 3L, 7L).foreach { q =>
      val single = Similarity.ivfPqTopK(e, q, 10).collect()
        .map(r => (r.getLong(0), r.getAs[Int]("cell"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("score")))).toSeq
      val batch = joined(q).sortBy(_.getAs[Int]("rnk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("score")))).toSeq
      assert(batch === single, s"query $q: the batch path diverged from ivfPqTopK")
    }
  }

  test("E17 broadcast path is bit-equal to the literal path and joins, not inlines, the model") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rnk"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("cell"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("score"))))
      .sortBy(t => (t._1, t._2)).toSeq
    val literal = Similarity.ivfPqKnnJoin(e, 0L until 8L, 10)
    val bcast = Similarity.ivfPqKnnJoin(e, 0L until 8L, 10,
      literalBatchLimit = 0)
    assert(key(bcast.collect()) === key(literal.collect()),
      "broadcast-joined ADC tables diverged from the literal tables")
    // the broadcast plan ships the model as joins (routing + query
    // tables), never as |queries|-scaled literals...
    val bp = bcast.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(bp).size >= 2, bp)
    // ...and the literal plan has no join before the top-k at all
    val lp = literal.queryExecution.executedPlan.toString
    assert(!lp.contains("Join"), lp)
  }

  test("E16 persisted IVF-PQ: probe matches the in-memory composition and prunes cell partitions") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val dir = tmpDir("graft_ivfpq_idx")
    Similarity.buildIvfPqIndex(e, dir)
    val qVec = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val probed = Similarity.probeIvfPqIndex(spark, dir, qVec, 20,
      excludeVecId = Some(0L))
    val inline = Similarity.ivfPqTopK(e, 0L, 20)
    val pr = probed.collect().map(r =>
      (r.getLong(0), r.getAs[Int]("cell"), r.getAs[Double]("score")))
    val im = inline.collect().map(r =>
      (r.getLong(0), r.getAs[Int]("cell"), r.getAs[Double]("score")))
    assert(pr.map(_._1).toSeq === im.map(_._1).toSeq)
    assert(pr.map(_._2).toSeq === im.map(_._2).toSeq,
      "probe and inline must route every result to the same cell")
    pr.zip(im).foreach { case ((_, _, a), (_, _, b)) =>
      assert(math.abs(a - b) < 1e-12) }
    // pruning: the probe scan filters on the cell partition directories
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // the stored form really is 4-bit codes, never a float mirror
    val stored = spark.read.parquet(s"$dir/codes")
    assert(!stored.columns.contains("embedding"))
    assert(stored.schema("codes").dataType.simpleString === "array<int>")
  }

  test("E7 persisted SQ8 index search matches the inline quantize-and-search") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val dir = tmpDir("graft_sq8_idx")
    graft.operators.Similarity.buildSq8Index(e, dir)
    val qVec = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val persisted = graft.operators.Similarity
      .searchSq8Index(spark, dir, qVec, 20, excludeVecId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    val inline = graft.operators.Similarity.sq8TopK(e, 0L, 20)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    assert(persisted.map(_._1).toSeq === inline.map(_._1).toSeq)
    persisted.zip(inline).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-12) }
    // the stored table really is the code form, not a float mirror
    val stored = spark.read.parquet(s"$dir/codes")
    assert(stored.schema("codes").dataType.simpleString === "array<tinyint>")
    assert(!stored.columns.contains("embedding"))
  }

  test("E4 fit/probe split composes to the one-shot learned-IVF result") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val model = graft.operators.Similarity.fitIvfKmeans(e)
    val split = graft.operators.Similarity.ivfProbeLearned(e, model, 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val oneShot = graft.operators.Similarity.ivfTopKLearned(e, 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(split === oneShot)
  }

  test("E4 Lloyd recall parity: the portable fit serves as well as MLlib k-means on this corpus") {
    // the round-12 oracle trade, measured (the d21 honesty standard):
    // e4's driver query now runs the DETERMINISTIC Lloyd fit (2
    // iterations, seeded init, integer-sum means) instead of MLlib
    // k-means‖ — this records that the portability did not cost recall.
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val exact = graft.operators.Similarity.cosineTopK(e, 0L, 20)
      .collect().map(_.getLong(0)).toSet
    def recall(ids: Set[Long]): Double =
      exact.intersect(ids).size.toDouble / exact.size
    val lloyd = recall(graft.operators.Similarity.ivfTopKLloyd(e, 0L, 20)
      .collect().map(_.getLong(0)).toSet)
    val mllib = recall(graft.operators.Similarity.ivfTopKLearned(e, 0L, 20)
      .collect().map(_.getLong(0)).toSet)
    info(f"recall@20 vs exact — lloyd: $lloyd%.2f, mllib k-means: $mllib%.2f")
    // both are 2-probe/16-cell ANN sweeps on a tiny corpus; the pin is
    // parity (the portable fit must not LOSE to the sampled one), not
    // an absolute recall bar (that is e23's probe-sweep job)
    assert(lloyd >= mllib - 0.10001,
      f"portable Lloyd recall $lloyd%.2f fell behind MLlib $mllib%.2f")
    assert(lloyd > 0.0, "Lloyd IVF found none of the true top-20")
  }

  test("E8 PQ codes are 4-bit and ADC search keeps useful recall vs exact") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val codes = graft.operators.Similarity.quantizePq(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.forall(_._2.length === 8), "one code per subspace")
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)), "codes fit 4 bits")
    val exact = graft.operators.Similarity.cosineTopK(e, 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val pq = graft.operators.Similarity.pqTopK(e, 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ@m=8 recall vs exact dropped to $recall")
    assert(pq.size === 20)
  }

  test("E8 persisted PQ index search matches the inline encode-and-search") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val dir = tmpDir("graft_pq_idx")
    graft.operators.Similarity.buildPqIndex(e, dir)
    val qVec = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val persisted = graft.operators.Similarity
      .searchPqIndex(spark, dir, qVec, 20, excludeVecId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    val inline = graft.operators.Similarity.pqTopK(e, 0L, 20)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    assert(persisted.map(_._1).toSeq === inline.map(_._1).toSeq)
    persisted.zip(inline).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-12) }
    // stored index is codes-only: 8 small ints per vector, no floats
    val stored = spark.read.parquet(s"$dir/codes")
    assert(stored.columns.toSet === Set("vec_id", "codes"))
  }

  test("E8 learned codebooks cut quantization error vs the seeded ones") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val rows = e.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def meanErr(cents: Array[Array[Array[Double]]]): Double = {
      val sub = cents(0)(0).length
      rows.map { v =>
        (0 until Similarity.pqSubspaces).map { s =>
          cents(s).map { cv =>
            var d2 = 0.0; var d = 0
            while (d < sub) {
              val diff = v(s * sub + d) - cv(d); d2 += diff * diff; d += 1
            }
            d2
          }.min
        }.sum
      }.sum / rows.length
    }
    val seeded = meanErr(Similarity.pqSeededCodebook(e))
    val learned = meanErr(Similarity.fitPqKmeans(e))
    assert(learned < seeded,
      s"k-means codebook must beat seeds: learned $learned vs seeded $seeded")
    // the PORTABLE Lloyd fit (round 12, the e8 oracle path) starts AT
    // the seeded book, and each assignment/update step cannot increase
    // quantization error (the 1e-9 mean quantization is noise-level) —
    // so it must beat the seeds too
    val lloyd = meanErr(Similarity.fitPqLloyd(e))
    info(f"mean sq quantization error — seeded $seeded%.4f, " +
      f"lloyd $lloyd%.4f, mllib $learned%.4f")
    assert(lloyd < seeded,
      s"Lloyd codebook must beat its own seeds: lloyd $lloyd vs seeded $seeded")
    // and the learned search still returns a full, deterministic top-k
    val r1 = Similarity.pqTopKLearned(e, 0L, 10).collect().map(_.getLong(0)).toSeq
    val r2 = Similarity.pqTopKLearned(e, 0L, 10).collect().map(_.getLong(0)).toSeq
    assert(r1.length === 10 && r1 === r2)
  }

  test("E2 candidate pairs stay within buckets (no cross join)") {
    val e = vecs(
      0L -> Seq(1f, 1f, 1f, 1f),
      1L -> Seq(2f, 2f, 2f, 2f),
      2L -> Seq(-1f, -1f, -1f, -1f))
    val pairs = Similarity.annCandidates(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))   // parallel ⇒ same bucket
    assert(!pairs.contains((0L, 2L))) // antipodal ⇒ all sign bits flip
  }

  test("E13 per-label kNN: equals the per-class filtered exact top-k; plan prunes per partition") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.table(spark, SF, "embeddings")
    val df = Similarity.knnPerLabel(emb, 0L, 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-label top-k must prune before the label shuffle\n$plan")
    val got = df.collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("vec_id"))).toSet
    // reference: brute-force each label independently through e1's exact scorer
    val labels = emb.select(col("label")).distinct().collect().map(_.getInt(0))
    val want = labels.flatMap { l =>
      Similarity.cosineTopK(
        emb.filter(col("label") === l || col("vec_id") === 0L), 0L, 5)
        .collect().map(r => (l, r.getAs[Long]("vec_id")))
    }.toSet
    assert(got === want)
  }

  test("E14 recall harness equals the independently intersected ANN∩exact fractions") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val exact = Similarity.cosineTopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    val expect = Map(
      "lsh" -> Similarity.annTopK(e, 0L, 20).collect().map(_.getLong(0)).count(exact.contains),
      "ivf" -> Similarity.ivfTopK(e, 0L, 20).collect().map(_.getLong(0)).count(exact.contains))
    val out = Similarity.annRecall(e, 0L, 20).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))).toMap
    assert(out.keySet === Set("lsh", "ivf"))
    expect.foreach { case (m, n) =>
      assert(out(m) === ((20L, n.toLong, n / 20.0)),
        s"method $m recall must equal the hand-joined intersection")
    }
    out.values.foreach { case (_, n, r) =>
      assert(n >= 0L && n <= 20L && r >= 0.0 && r <= 1.0)
    }
  }

  test("E23 probe sweep: recall is monotone in probes and all-cells probing is EXACT") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val out = Similarity.ivfProbeSweep(e).collect()
      .map(r => r.getAs[Long]("n_probes") ->
        ((r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L, 16L))
    // probe sets are nested (top-p cells are prefixes of one centroid
    // ranking), so candidates only grow with p — recall is monotone
    out.map(_._2._2).toSeq.sliding(2).foreach { w =>
      assert(w.head <= w.last,
        s"recall must be monotone in probe count: ${out.toSeq}")
    }
    // nprobe = nCentroids probes every cell: routing prunes NOTHING,
    // and since routing never rescores the result IS exact top-k
    assert(out.last._2 === ((20L, 1.0)),
      s"all-cells probing must be exact: ${out.last}")
    // each point equals the hand-joined intersection at that p
    val exact = Similarity.cosineTopK(e, 0L, 20).collect().map(_.getLong(0)).toSet
    out.foreach { case (p, (nHit, _)) =>
      val want = Similarity.ivfTopK(e, 0L, 20, nProbes = p.toInt)
        .collect().map(_.getLong(0)).count(exact.contains)
      assert(nHit === want.toLong, s"p=$p n_hit drifted from the hand join")
    }
  }

  test("E24 batch recall: one row per query, equal to the hand-joined per-query intersection") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val exact = Similarity.knnJoin(e, 0L until 8L, 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = Similarity.ivfPqKnnJoin(e, 0L until 8L, 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = Similarity.batchRecall(e).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))).toMap
    assert(out.keySet === (0L until 8L).toSet,
      "every query must appear exactly once (zero-hit queries included)")
    (0L until 8L).foreach { q =>
      val want = ann.getOrElse(q, Set.empty).count(exact(q).contains)
      assert(out(q) === ((want.toLong, want / 10.0)),
        s"q=$q recall drifted from the hand intersection")
    }
  }

  test("E25 quant error: SQ8 is near-lossless, PQ is coarse, and the report covers every vector per codec") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val out = Similarity.quantErrorReport(e).collect()
      .map(r => (r.getAs[String]("codec"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("recon_cos")))
    val byCodec = out.groupBy(_._1)
    assert(byCodec.keySet === Set("sq8", "pq", "pq_opq"))
    val total = e.count()
    byCodec.foreach { case (c, rows) =>
      assert(rows.length.toLong === total, s"$c must cover every vector")
      rows.foreach { case (_, id, cos) =>
        assert(cos <= 1.0 + 1e-9 && cos > 0.0, s"$c vec $id cos $cos out of range")
      }
    }
    // the codec decision the report exists to make: SQ8's WORST vector
    // reconstructs better than PQ's corpus MEAN (4x vs 16x compression)
    val sq8Min = byCodec("sq8").map(_._3).min
    val pqMean = byCodec("pq").map(_._3).sum / byCodec("pq").length
    assert(sq8Min > 0.999, s"SQ8 must be near-lossless, worst $sq8Min")
    assert(sq8Min > pqMean, s"SQ8 worst ($sq8Min) must beat PQ mean ($pqMean)")
  }

  test("E26 OPQ: rotation preserves true cosines, recall report grades both codecs") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    // orthogonality in action: the rotated corpus's exact cosine top-k
    // (query = rotated vec 0) must equal the unrotated exact top-k —
    // Householder chains preserve inner products and norms
    val rot = Similarity.opqRotate(e)
    val exactRaw = Similarity.cosineTopK(e, 0L, 10).collect().map(_.getLong(0)).toSeq
    val exactRot = Similarity.cosineTopK(rot, 0L, 10).collect().map(_.getLong(0)).toSeq
    assert(exactRot === exactRaw,
      "orthogonal rotation must preserve the exact cosine ranking")
    val rep = Similarity.opqRecallReport(e).collect()
      .map(r => r.getAs[String]("codec") ->
        ((r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))).toMap
    assert(rep.keySet === Set("pq", "pq_opq"))
    rep.foreach { case (c, (hit, rec)) =>
      assert(hit >= 0L && hit <= 20L, s"$c n_hit $hit out of range")
      assert(math.abs(rec - hit / 20.0) < 1e-12, s"$c recall must be n_hit/k")
    }
  }

  test("E18 RRF equals the driver-recomputed fusion of the two ranked lists") {
    import graft.operators.TextAnalysis
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    // independent recompute: rank each list by (score desc, id), fuse
    val dense = Similarity.cosineTopK(e, 0L, 20).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val sparse = TextAnalysis.bm25(docs, TextAnalysis.bm25QueryTerms, 10).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val expected = (dense.keySet ++ sparse.keySet).toSeq.map { id =>
      val s = sparse.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      val d = dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      id -> (s + d)
    }.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val out = Similarity.hybridRrf(e, docs, 0L, TextAnalysis.bm25QueryTerms)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf_score")))
    assert(out.toSeq === expected,
      "fused order/scores must match the driver recompute bit-for-bit")
    // a doc on BOTH lists carries both contributions
    val both = dense.keySet intersect sparse.keySet
    if (both.nonEmpty) {
      val id = both.head
      val want = 1.0 / (60 + sparse(id)) + 1.0 / (60 + dense(id))
      assert(out.toMap.get(id).forall(_ == want))
    }
    // ranks surface for diagnosis: present iff the doc made that list
    val rows = Similarity.hybridRrf(e, docs, 0L, TextAnalysis.bm25QueryTerms)
      .collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[Any]("bm25_rank") == null) === !sparse.contains(id))
      assert((r.getAs[Any]("cos_rank") == null) === !dense.contains(id))
    }
  }

  test("E20 capped top-k: the cap binds per source and the list equals the hand-capped recompute") {
    import graft.sources.Tables
    val e = Tables.table(spark, SF, "embeddings")
    val docs = Tables.table(spark, SF, "documents")
    val out = Similarity.cappedTopK(e, docs, 0L).collect()
    assert(out.length === 10)
    assert(out.groupBy(_.getAs[String]("source")).values.forall(_.length <= 2),
      "no source may hold more than the cap")
    assert(out.forall(_.getAs[Long]("src_rank") <= 2L))
    // driver recompute: order ALL scored rows, admit while the source
    // has quota, take 10 — ids and scores must match bit-for-bit
    val n = e.count().toInt
    val all = Similarity.cosineTopK(e, 0L, n).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val quota = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val expected = all.sortBy { case (id, sc) => (-sc, id) }.flatMap { case (id, sc) =>
      val s = srcOf(id)
      if (quota(s) < 2) { quota(s) += 1; Some((id, sc)) } else None
    }.take(10)
    assert(out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSeq
      === expected.toSeq)
  }

  test("E19 drift: fixed-point means are exact on representable components") {
    // every component is exactly representable and an exact multiple of
    // 2^-20, so floor(x·2^20) loses nothing: the means are EXACT
    val e = vecs(
      0L -> Seq(1.0f, 2.0f),   // ref slice (even ids)
      2L -> Seq(3.0f, 4.0f),   // ref
      1L -> Seq(0.5f, -0.5f),  // incoming (odd ids)
      3L -> Seq(1.5f, 0.5f))   // incoming
    val out = Similarity.embeddingDrift(e).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Double]("mean_ref"), r.getAs[Double]("mean_inc"),
          r.getAs[Double]("drift")))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2.0, 1.0, 1.0)))
    assert(out(2L) === ((3.0, 0.0, 3.0)))
  }

  test("native cell routing is bit-identical to the composable argmax, float and double books") {
    // round-15: CellRoute replaced array_position(cs, array_max(cs))−1
    // in every IVF consumer (the derived-cell filter pushdown made the
    // interpreted form the e3/e15/e17 bottleneck at sf1). The retired
    // composable form stays HERE as the reference arm: same scores,
    // same first-argmax tie rule, over the real corpus.
    import org.apache.spark.sql.functions._
    val e = Similarity.withNorm(
      graft.sources.Tables.table(spark, SF, "embeddings"))
    val seeds = e.orderBy(col("vec_id")).limit(16)
      .select(col("embedding"), col("nrm")).collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getDouble(1)))
    val ref = e
      .withColumn("cs", Similarity.centScores(seeds, col("embedding"), col("nrm")))
      .withColumn("cell",
        (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = Similarity.assignCells(e, seeds)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native === ref, "CellRoute diverged from the composable argmax")
    // the double-book arm (Lloyd means) through the same expression
    val seedsD = seeds.map { case (v, n) => (v.map(_.toDouble), n) }
    val refD = e
      .withColumn("cs", Similarity.centScoresD(seedsD, col("embedding"), col("nrm")))
      .withColumn("cell",
        (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nativeD = e
      .withColumn("cell", Similarity.cellOfD(seedsD, col("embedding"), col("nrm")))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(nativeD === refD, "double-book CellRoute diverged")
    // a tie takes the LOWEST cell: two identical centroids
    import spark.implicits._
    val tied = Similarity.withNorm(
      Seq((7L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"))
    val twin = Array((Array(1.0f, 0.0f), 1.0), (Array(1.0f, 0.0f), 1.0))
    assert(Similarity.assignCells(tied, twin).select("cell").head.getInt(0) === 0)
  }

  test("native PQ encode and ADC gather-sum are bit-identical to the staged HOF forms") {
    import org.apache.spark.sql.functions._
    val e = Similarity.withNorm(
      graft.sources.Tables.table(spark, SF, "embeddings"))
    val book = Similarity.pqSeededCodebook(
      graft.sources.Tables.table(spark, SF, "embeddings"))
    // reference arm: the retired three-stage HOF encode, verbatim
    val sub = book(0)(0).length
    val nsq = Array.tabulate(8, 16) { (s, c) =>
      var acc = 0.0; var d = 0
      while (d < book(s)(c).length) { acc += book(s)(c)(d) * book(s)(c)(d); d += 1 }
      acc
    }
    val staged = e
      .select(col("vec_id") +:
        Seq(transform(sequence(lit(0), lit(7)),
          s => slice(col("embedding"), s * sub + 1, lit(sub))).as("subs")): _*)
      .select(col("vec_id") +: (0 until 8).map { s =>
        array((0 until 16).map { c =>
          lit(nsq(s)(c)) - lit(2.0) * graft.functions.VectorFunctions.vecDot(
            element_at(col("subs"), s + 1),
            typedLit(book(s)(c).map(_.toFloat).toSeq))
        }: _*).as(s"d$s")
      }: _*)
      .select(col("vec_id") +:
        Seq(array((0 until 8).map { s =>
          (array_position(col(s"d$s"), array_min(col(s"d$s"))) - 1).cast("int")
        }: _*).as("codes")): _*)
    val refCodes = staged.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val nativeCodes = Similarity.quantizePqWith(
      graft.sources.Tables.table(spark, SF, "embeddings"), book).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(nativeCodes === refCodes, "PqEncode diverged from the staged HOF encode")
    // AdcGatherSum vs the interpreted fold, on the same codes
    val tabLit = typedLit(nsq.map(_.toSeq).toSeq)
    val refSum = staged.select(col("vec_id"),
      aggregate(sequence(lit(0), lit(7)), lit(0.0), (acc, s) =>
        acc + element_at(element_at(tabLit, (s + 1).cast("int")),
          (element_at(col("codes"), (s + 1).cast("int")) + 1).cast("int"))).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nativeSum = staged.select(col("vec_id"),
      graft.functions.VectorFunctions.adcSum(tabLit, col("codes")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nativeSum === refSum, "AdcGatherSum diverged from the HOF fold")
  }

  test("E23 planner: planProbes picks the smallest sweep point meeting the recall target") {
    val emb = graft.sources.Tables.table(spark, SF, "embeddings")
    val sweep = Similarity.ivfProbeSweep(emb).collect()
      .map(r => r.getAs[Long]("n_probes").toInt -> r.getAs[Double]("recall")).toMap
    // the planner must agree with a hand fold over its own sweep
    for (target <- Seq(0.5, 0.95, 1.0)) {
      val expected = Seq(1, 2, 4, 8, 16).find(p => sweep(p) >= target).getOrElse(16)
      assert(Similarity.planProbes(emb, targetRecall = target) === expected,
        s"planner disagreed with its sweep at target $target")
    }
    // the sweep's provable endpoint: probing every cell is recall 1.0,
    // so ANY target is satisfiable and the fallback never misroutes
    assert(sweep(16) === 1.0)
  }
}
