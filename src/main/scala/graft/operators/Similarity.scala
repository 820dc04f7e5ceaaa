package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * Exact brute-force cosine top-k is the correctness baseline; the scale
  * path is random-hyperplane LSH bucketing: sketch each vector to a small
  * bit signature, shuffle on the bucket key, and search only within the
  * probed bucket — O(n/buckets) per query instead of O(n), and the bucket
  * join is an equi-join Catalyst executes as a hash join.
  *
  * Vector math runs through the native codegen'd [[dot]] expression
  * wherever it is hot (scoring, PQ encode); higher-order array
  * functions cover the cold constant-size folds (bucket bits, ADC
  * table sums). No UDFs; driver-side `.collect()`s are bounded model
  * state only (≤16 centroid rows, 1 query row, ≤k results).
  */
object Similarity {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.table(s, d, name)

  /** Dot product via the native codegen'd [[graft.functions.FloatVecDot]]
    * expression: identical left-to-right double accumulation as the
    * `aggregate(zip_with(...))` fold (bit-reproducible against the
    * DuckDB oracle), but a primitive loop inside WholeStageCodegen
    * instead of interpreted per-element closures.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Attach the L2 norm once per vector (cheaper than recomputing it per
    * candidate pair). Zero vectors are dropped: a 0 norm would divide by
    * zero under ANSI mode (and a zero vector has no defined direction to
    * rank by). The oracles carry the same `nrm > 0` guard.
    */
  def withNorm(e: DataFrame): DataFrame =
    e.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .filter(col("nrm") > 0)

  /** Exact cosine top-k for one query vector. The query side is a single
    * broadcast row; the corpus side is one scan + a global top-k (Spark
    * runs orderBy+limit as per-partition top-k then a k-row merge).
    */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E9: exact cosine top-k restricted to corpus rows whose metadata
    * row (joined on vec_id = doc_id) passes `pred` — pre-filter
    * semantics: the k results all satisfy the predicate and are the
    * true top-k of the filtered pool. The query vector is looked up in
    * the UNfiltered corpus (a query needn't satisfy the predicate it
    * filters by).
    */
  def filteredCosineTopK(embeddings: DataFrame, meta: DataFrame, pred: Column,
                         queryVecId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val allowed = meta.filter(pred).select(col("doc_id"))
    e.filter(col("vec_id") =!= queryVecId)
      .join(allowed, e("vec_id") === allowed("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Largest embedding dimension the precomputed hyperplane table covers;
    * the sign fold only reads up to `size(emb)` components, so smaller
    * vectors use a prefix and larger ones fail fast (element_at under
    * ANSI) instead of silently bucketing on truncated planes.
    */
  val maxPlaneDim = 128

  /** Deterministic, ENGINE-PORTABLE hyperplane component for (plane j,
    * 1-based dim i): the leading 15 hex chars of md5 of the decimal
    * string of `j*131071 + i`, mod 2001, shifted to [-1, 1] in steps of
    * 1/1000. Same construction as the md5Prefix60 shingle hash
    * (Dedup.shingleHashes) — md5 is bit-identical across engines, so a
    * DuckDB oracle reproduces every plane, hence every bucket, exactly
    * ([[bucketSql]]). xxhash64 would also work but is Spark-private,
    * which kept the bucketed forms stuck at rows-only checks.
    */
  private def planeComponent(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(String.valueOf(j * 131071 + i).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001L) - 1000L) / 1000.0
  }

  /** Precomputed plane table (8 planes × maxPlaneDim): the whole "model"
    * is ~1k doubles derived at plan-build time on the driver — no
    * per-row hashing, no stored state, reproducible on any cluster.
    */
  private lazy val hyperplanes: Array[Array[Double]] =
    Array.tabulate(8, maxPlaneDim)((j, i0) => planeComponent(j, i0 + 1))

  /** Random-hyperplane LSH bucket key: `bits` sign bits, each from the
    * dot product with a deterministic hyperplane carried as a LITERAL
    * array (see [[planeComponent]]) — the component lookup inside the
    * fold is two element_at reads of a constant, and the whole bucket is
    * reproducible bit-for-bit by the DuckDB oracle ([[bucketSql]]).
    */
  def lshBucket(emb: Column, bits: Int = 6): Column = {
    require(bits >= 1 && bits <= 8, s"bits must be in [1, 8], got $bits")
    val planes = typedLit(hyperplanes.take(bits).map(_.toSeq).toSeq)
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, j) => acc * 2 + when(
        aggregate(sequence(lit(1), size(emb)), lit(0.0),
          (s, i) => s + element_at(emb, i).cast("double") *
            element_at(element_at(planes, (j + 1).cast("int")), i)
        ) > 0, 1L).otherwise(0L))
  }

  /** DuckDB SQL expression reproducing [[lshBucket]] bit-for-bit over an
    * embedding column `c`: same md5-derived plane components, same
    * left-to-right double fold, same MSB-first bit packing — shared by
    * the e2/d5b/d10 oracles.
    */
  def bucketSql(c: String, bits: Int = 6): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(0, $bits), j ->
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len($c) + 1), i ->
       |        CAST($c[i] AS DOUBLE) *
       |        ((CAST(('0x' || substr(md5(CAST(j * 131071 + i AS VARCHAR)), 1, 15)) AS BIGINT)
       |          % 2001 - 1000) / 1000.0))),
       |      (x, y) -> x + y) > 0
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |  (acc, b) -> acc * 2 + b)""".stripMargin

  /** Multi-probe ANN top-k: probes the query's bucket plus every bucket
    * at hamming distance 1 (one flipped hyperplane sign) — the standard
    * multi-probe LSH recall boost: near neighbors that landed just
    * across one hyperplane are recovered at (bits+1)/2^bits of the
    * corpus instead of a full scan. Recall < 1 by construction; the
    * spec measures it against cosineTopK.
    */
  def annTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              bits: Int = 6, multiProbe: Boolean = true): DataFrame = {
    val e = withNorm(embeddings)
      .withColumn("bucket", lshBucket(col("embedding"), bits))
    val qRows = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm"), col("bucket")).take(1)
    if (qRows.isEmpty) {
      return e.select(col("vec_id"), col("bucket"), lit(0.0).as("score")).limit(0)
    }
    val qVec = qRows(0).getSeq[Float](0)
    val qNrm = qRows(0).getDouble(1)
    val qBucket = qRows(0).getLong(2)
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: (0 until bits).map(i => qBucket ^ (1L << i))
      else Seq(qBucket)
    e.filter(col("vec_id") =!= queryVecId && col("bucket").isin(probes: _*))
      .select(col("vec_id"), col("bucket"),
        (dot(col("embedding"), typedLit(qVec)) / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Bucketed candidate pairs for near-dup verification at scale:
    * grouped-bucket pair expansion — the corpus is sketched ONCE and
    * shuffled once on the bucket key (same pattern as
    * Dedup.minhashCandidates; a self-join would sketch and shuffle both
    * copies).
    */
  def annCandidates(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(col("vec_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // _outer: non-empty by the size guard; a plain explode's inferred
      // filter re-expands every bucket a second time (§6b round-15).
      // pair_expand is the r16 native form of the nested-HOF expansion
      // (same pairs, same order)
      .select(explode_outer(graft.functions.PairFunctions.pairExpand(
        col("ids"), "vec_a", "vec_b")).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"))

  /** IVF-style ANN: vectors are routed to their nearest of `nCentroids`
    * deterministic seed centroids (one broadcast pass, no shuffle of the
    * corpus); a query probes only its `nProbes` closest cells. The scale
    * path for repeated queries: the assignment is computed once and
    * reused, and each probe touches ~nProbes/nCentroids of the corpus.
    * (A production IVF learns centroids with k-means; seeded centroids
    * keep this deterministic and model-free.)
    */
  /** Seed centroids: the first nCentroids vectors by id — a handful of
    * small rows collected to the driver (the IVF "model"), like k-means
    * centers would be.
    */
  private def seedCentroids(e: DataFrame, nCentroids: Int): Array[(Array[Float], Double)] = {
    val cents = e.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getSeq[Float](1).toArray, r.getDouble(2)))
    require(cents.nonEmpty, "corpus has no non-zero vectors to seed centroids")
    cents
  }

  /** Cosine of each centroid against the row's vector, as one array
    * column (literal centroid vectors — no join, no shuffle).
    */
  private[graft] def centScores(cents: Array[(Array[Float], Double)],
                                embCol: Column, nrmCol: Column): Column = array(
    cents.toIndexedSeq.map { case (cv, cn) =>
      dot(embCol, typedLit(cv.toSeq)) / (nrmCol * lit(cn))
    }: _*)

  /** The cosine-argmax cell of a row against a FLOAT centroid model —
    * the native [[graft.functions.CellRoute]] (round 15): bit-identical
    * to `array_position(centScores, array_max(centScores)) − 1` but
    * ~1 µs/row, so the derived-cell FILTER every IVF consumer pushes
    * below this projection (the §6b class — it cost 6.8 s/pass at sf1)
    * re-evaluates a tight loop instead of 32 interpreted cosines.
    */
  private[graft] def cellOf(cents: Array[(Array[Float], Double)],
                            embCol: Column, nrmCol: Column): Column =
    graft.functions.VectorFunctions.cellRoute(embCol, nrmCol,
      typedLit(cents.map(_._1.toSeq).toSeq),
      typedLit(cents.map(_._2).toSeq))

  /** [[cellOf]] over DOUBLE centroids (Lloyd means). */
  private[graft] def cellOfD(cents: Array[(Array[Double], Double)],
                             embCol: Column, nrmCol: Column): Column =
    graft.functions.VectorFunctions.cellRoute(embCol, nrmCol,
      typedLit(cents.map(_._1.toSeq).toSeq),
      typedLit(cents.map(_._2).toSeq))

  /** The query's nProbes closest cells, computed driver-side from the
    * collected centroid model.
    */
  private[graft] def probeCellsFor(cents: Array[(Array[Float], Double)],
                                   qVec: Array[Float], qNrm: Double,
                                   nProbes: Int): Seq[Int] =
    cents.zipWithIndex.map { case ((cv, cn), i) =>
      val d = cv.zip(qVec).map { case (a, b) => a.toDouble * b.toDouble }.sum / (cn * qNrm)
      (i, d)
    }.sortBy { case (i, d) => (-d, i) }.take(nProbes).map(_._1).toSeq

  def ivfTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              nCentroids: Int = 16, nProbes: Int = 2): DataFrame = {
    val e = withNorm(embeddings)
    // Assignment is a pure per-row argmax projection: NO shuffle and no
    // row blowup on the corpus side.
    val cents = seedCentroids(e, nCentroids)
    val qRows = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).take(1)
    if (qRows.isEmpty) {
      return e.select(col("vec_id"), lit(0).as("cell"), lit(0.0).as("score")).limit(0)
    }
    val qVec = qRows(0).getSeq[Float](0).toArray
    val qNrm = qRows(0).getDouble(1)
    val probeCells = probeCellsFor(cents, qVec, qNrm, nProbes)
    e.filter(col("vec_id") =!= queryVecId)
      // native argmax routing (first-match ⇒ lowest cell id on ties);
      // the probe filter pushes below and re-runs it — cheap by design
      .withColumn("cell", cellOf(cents, col("embedding"), col("nrm")))
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell"),
        (dot(col("embedding"), typedLit(qVec.toSeq)) / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E6: persisted IVF index — build once, probe many times. The corpus
    * is assigned to cells ONCE and written `partitionBy("cell")`, so a
    * probe reads only its nProbes cell directories (partition pruning —
    * probe I/O is nProbes/nCentroids of the corpus, the on-disk analogue
    * of the in-memory IVF routing). The centroid model is a tiny parquet
    * table alongside.
    */
  def buildIvfIndex(embeddings: DataFrame, dir: String,
                    nCentroids: Int = 16): Unit = {
    val e = withNorm(embeddings)
    val cents = seedCentroids(e, nCentroids)
    val spark = embeddings.sparkSession
    import spark.implicits._
    cents.zipWithIndex
      .map { case ((cv, cn), i) => (i, cv.toSeq, cn) }.toSeq
      .toDF("cent_id", "embedding", "nrm")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    assignCells(e, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
  }

  /** Cell assignment against a pinned centroid model — shared by the
    * batch index build and the H20 streaming maintenance path, so the
    * two can never drift (the H12 shared-arithmetic rule).
    */
  private[graft] def assignCells(e: DataFrame,
                                 cents: Array[(Array[Float], Double)]): DataFrame =
    e.withColumn("cell", cellOf(cents, col("embedding"), col("nrm")))

  /** The collected centroid model of a persisted index (tiny — the IVF
    * "model" row set).
    */
  private[graft] def readCentroids(spark: SparkSession,
                                   dir: String): Array[(Array[Float], Double)] =
    spark.read.parquet(s"$dir/centroids").orderBy(col("cent_id")).collect()
      .map(r => (r.getSeq[Float](1).toArray, r.getDouble(2)))

  /** Probe a persisted IVF index with an external query vector: the
    * query routes through the (collected, tiny) centroid table to its
    * nProbes cells, and ONLY those cell partitions are scanned — the
    * fully pruned path, probe I/O = nProbes/nCentroids of the corpus.
    * Same scoring and ordering as [[ivfTopK]].
    */
  def probeIvfIndexVec(spark: SparkSession, dir: String, qVec: Array[Float],
                       k: Int, nProbes: Int = 2,
                       excludeVecId: Option[Long] = None): DataFrame = {
    val cents = readCentroids(spark, dir)
    val qNrm = math.sqrt(qVec.map(x => x.toDouble * x.toDouble).sum)
    require(qNrm > 0, "query vector has zero norm")
    val probeCells = probeCellsFor(cents, qVec, qNrm, nProbes)
    val vectors = spark.read.parquet(s"$dir/vectors")
    val excluded = excludeVecId
      .map(id => vectors.filter(col("vec_id") =!= id)).getOrElse(vectors)
    excluded
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        (dot(col("embedding"), typedLit(qVec.toSeq)) / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Probe by the id of an indexed vector. The id→vector lookup is one
    * un-pruned (row-group-stat-filtered) scan of the index before the
    * pruned probe — when the caller already has the vector, use
    * [[probeIvfIndexVec]] to keep the whole probe at nProbes cells.
    */
  def probeIvfIndex(spark: SparkSession, dir: String, queryVecId: Long,
                    k: Int, nProbes: Int = 2): DataFrame = {
    val vectors = spark.read.parquet(s"$dir/vectors")
    val qRows = vectors.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).take(1)
    if (qRows.isEmpty) {
      return vectors.select(col("vec_id"), col("cell"), lit(0.0).as("score")).limit(0)
    }
    probeIvfIndexVec(spark, dir, qRows(0).getSeq[Float](0).toArray, k,
      nProbes, excludeVecId = Some(queryVecId))
  }

  /** Fit half of the learned-IVF path: MLlib k-means over the (norm-
    * filtered) corpus. Split out so the one-time model fit and the
    * per-query probe can be provisioned — and benchmarked — separately:
    * the fit is a heavy multi-pass job run once per index build, the
    * probe is the steady-state serving cost.
    */
  def fitIvfKmeans(embeddings: DataFrame,
                   nCentroids: Int = 16): org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = withNorm(embeddings)
      .withColumn("fv", array_to_vector(col("embedding").cast("array<double>")))
    new KMeans()
      .setK(nCentroids).setSeed(42L).setMaxIter(10).setFeaturesCol("fv")
      .fit(e)
  }

  /** IVF with LEARNED centroids: MLlib k-means replaces the seed
    * centroids — better-balanced cells on clustered corpora, same probe
    * interface. The model's centers are the only driver-side state (k
    * small vectors); assignment and probing stay distributed. The
    * corpus-wide assignment cache is dropped before returning — the ≤k
    * result rows come back as a local DataFrame, so no cached blocks
    * outlive the call.
    */
  def ivfTopKLearned(embeddings: DataFrame, queryVecId: Long, k: Int,
                     nCentroids: Int = 16, nProbes: Int = 2): DataFrame =
    ivfProbeLearned(embeddings, fitIvfKmeans(embeddings, nCentroids),
      queryVecId, k, nProbes)

  /** Probe half of the learned-IVF path — see [[ivfTopKLearned]] for the
    * caching/lifetime contract.
    */
  def ivfProbeLearned(embeddings: DataFrame,
                      model: org.apache.spark.ml.clustering.KMeansModel,
                      queryVecId: Long, k: Int,
                      nProbes: Int = 2): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    val e = withNorm(embeddings)
      .withColumn("fv", array_to_vector(col("embedding").cast("array<double>")))
    // cache: the assignment feeds both the query lookup and the probe
    // scan — without it the KMeans transform would run per action
    val assigned = model.transform(e)
      .withColumnRenamed("prediction", "cell").drop("fv")
      .persist()
    try {
      val qRows = assigned.filter(col("vec_id") === queryVecId)
        .select("embedding", "nrm").take(1)
      val resPlan =
        if (qRows.isEmpty)
          assigned.select(col("vec_id"), col("cell"), lit(0.0).as("score")).limit(0)
        else {
          val qVec = qRows(0).getSeq[Float](0).map(_.toDouble).toArray
          val probeCells = model.clusterCenters.zipWithIndex
            .map { case (c, i) =>
              val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
              (i, d)
            }
            .sortBy(_._2).take(nProbes).map(_._1).toSeq
          val q = assigned.filter(col("vec_id") === queryVecId)
            .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
          assigned.filter(col("vec_id") =!= queryVecId && col("cell").isin(probeCells: _*))
            .crossJoin(broadcast(q))
            .select(col("vec_id"), col("cell"),
              (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
            .orderBy(col("score").desc, col("vec_id"))
            .limit(k)
        }
      // materialize the tiny top-k while the cache is live, then return it
      // as a local frame (schema preserved) so the cache can be released
      val rows = java.util.Arrays.asList(resPlan.collect(): _*)
      spark.createDataFrame(rows, resPlan.schema)
    } finally assigned.unpersist()
  }

  /** Batch kNN join: exact cosine top-k for a SET of query vectors in one
    * corpus scan — the shape a real pipeline runs (kNN for every probe /
    * eval vector), not one query at a time. The query side broadcasts;
    * the corpus side is scanned once and scored against all queries
    * map-side. The `row_number <= k` filter triggers Spark's
    * WindowGroupLimit pushdown: each map partition keeps only its local
    * top-k per query BEFORE the shuffle, so the exchange carries
    * O(k × partitions) rows per query, not the full scored corpus.
    * For huge query sets, swap the broadcast for lshBucket equi-joins
    * (the E2 path) — same output contract.
    */
  def knnJoin(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** E13: label-partitioned kNN — "the k nearest neighbors of the
    * query WITHIN EACH class" (per-cluster exemplars, per-source
    * nearest examples, contrastive-pair mining): one corpus scan
    * scores against the broadcast query, then `row_number <= k` per
    * label triggers WindowGroupLimit — each partition keeps its local
    * k per label before the one (label)-keyed exchange, so the wire
    * carries O(k × labels × partitions) rows at any corpus size. The
    * composed alternative (one filtered e1 per label) scans the corpus
    * |labels| times; this is the single-pass form.
    */
  def knnPerLabel(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("label")).orderBy(col("score").desc, col("vec_id"))
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("label"), col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** E7: scalar quantization (SQ8) — each corpus vector stored as
    * 256-level byte codes plus per-vector (min, step): a 4× memory cut
    * on the corpus side of similarity search (the dominant cost of a
    * 100 TB embedding store), with per-component reconstruction error
    * bounded by step/2. Pure array expressions — quantize at write
    * time, dequantize at scan time, and the same top-k/kNN plumbing
    * runs unchanged on the reconstructed vectors. Constant-component
    * vectors (max = min) take step 1 and encode exactly.
    */
  def quantizeSq8(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qmin", array_min(col("embedding")).cast("double"))
      .withColumn("qmax", array_max(col("embedding")).cast("double"))
      .withColumn("qstep",
        when(col("qmax") > col("qmin"), (col("qmax") - col("qmin")) / 255.0)
          .otherwise(lit(1.0)))
      .withColumn("codes",
        transform(col("embedding"), x =>
          round((x.cast("double") - col("qmin")) / col("qstep")).cast("int") - 128)
          .cast("array<tinyint>"))
      .select("vec_id", "qmin", "qstep", "codes")

  /** Inverse of [[quantizeSq8]]: reconstructed float vectors, ready for
    * the unchanged search operators.
    */
  def dequantizeSq8(quantized: DataFrame): DataFrame =
    quantized
      .withColumn("embedding",
        transform(col("codes"), c =>
          (col("qmin") + (c.cast("double") + 128.0) * col("qstep")).cast("float")))
      .select("vec_id", "embedding")

  /** E7 persisted form — quantize ONCE, store the code table, search
    * many: the scale deployment of SQ8 (the inline
    * quantize-then-search of [[sq8TopK]] is the correctness/recall
    * demo). The stored table is (vec_id, qmin, qstep, codes) — byte
    * codes instead of floats, the 4× corpus I/O cut realized at READ
    * time on every subsequent search.
    */
  def buildSq8Index(embeddings: DataFrame, dir: String): Unit =
    quantizeSq8(embeddings).write.mode("overwrite").parquet(s"$dir/codes")

  /** Search a persisted SQ8 code table with a full-precision query
    * vector: a codes-only scan (no float corpus touched), dequantize at
    * scan time, then the same scoring/ordering as [[sq8TopK]].
    */
  def searchSq8Index(spark: SparkSession, dir: String, qVec: Array[Float],
                     k: Int, excludeVecId: Option[Long] = None): DataFrame = {
    val qNrm = math.sqrt(qVec.map(x => x.toDouble * x.toDouble).sum)
    require(qNrm > 0, "query vector has zero norm")
    val codes = spark.read.parquet(s"$dir/codes")
    val filtered = excludeVecId
      .map(id => codes.filter(col("vec_id") =!= id)).getOrElse(codes)
    withNorm(dequantizeSq8(filtered))
      .select(col("vec_id"),
        (dot(col("embedding"), typedLit(qVec.toSeq)) / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact-query / compressed-corpus top-k: the query vector stays
    * full-precision (one row), the corpus is searched through its SQ8
    * reconstruction — the standard serving trade. Recall vs the exact
    * E1 baseline is measured in the spec.
    */
  def sq8TopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = withNorm(embeddings).filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    withNorm(dequantizeSq8(quantizeSq8(embeddings)))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E11: radius (range) search — every corpus vector within a cosine
    * threshold of the query, the "all neighbors in range" dual of
    * top-k (dedup wants "everything above 0.9", not "the best 20").
    * Same broadcast-query one-scan shape as [[cosineTopK]] but the
    * filter replaces the global top-k merge: fully partition-parallel,
    * no ordering stage at all — output size is data-dependent, so at
    * 100 TB this is a scan + filter writing matches partition-local,
    * strictly cheaper than any top-k.
    */
  def radiusSearch(embeddings: DataFrame, queryVecId: Long,
                   threshold: Double): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .filter(col("score") >= threshold)
  }

  /** E12: two-stage retrieve-then-rerank — the standard serving
    * architecture for compressed indexes: stage 1 ranks the corpus
    * through its SQ8 reconstruction (codes-only scan, 4× less I/O —
    * [[sq8TopK]]'s arithmetic) and keeps `nCand` candidates; stage 2
    * re-scores ONLY those candidates against the full-precision
    * vectors and emits the exact top-k. The candidate id set is ≤nCand
    * rows so the rerank join broadcasts; total full-precision reads =
    * nCand rows instead of the corpus. Recall vs E1 is bounded by
    * stage 1's quantization error (spec'd); the output scores are
    * EXACT cosines, which is what makes the two-stage form usable as a
    * drop-in for e1 wherever the candidate pool covers the true top-k.
    */
  def sq8Rerank(embeddings: DataFrame, queryVecId: Long,
                nCand: Int = 50, k: Int = 10): DataFrame = {
    val cand = sq8TopK(embeddings, queryVecId, nCand).select(col("vec_id"))
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    e.join(cand, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E8: product quantization (PQ, Jégou et al. 2011) — the corpus is
    * split into `m` subspaces, each encoded as the index of its nearest
    * of 16 seeded centroids: 4-bit codes, a 16× memory cut at dim 64
    * (vs SQ8's 4×). Centroids are the first 16 corpus vectors'
    * subvectors (the deterministic seeding of E3 — no stored model, and
    * the whole pipeline reproduces in the DuckDB oracle; a production
    * build swaps in per-subspace k-means without touching the search).
    *
    * Encode cost is per-row argmin over a LITERAL centroid table — no
    * join, no shuffle, embarrassingly parallel. Staged one HOF per
    * projection (SURVEY §6b): the distance table materializes before
    * the argmin reads it, so nothing re-evaluates.
    */
  val pqSubspaces = 8
  val pqCentroids = 16

  /** Query-batch size above which [[ivfPqKnnJoin]] switches from plan
    * literals to broadcast-joined model tables: below it the per-query
    * ADC dot tables (|queries|×8×16 doubles) are trivially plan-sized
    * and literals win (zero joins before top-k); above it plan size
    * and codegen would scale with |queries| — the round-8 verdict's
    * one flagged 100×-scale killer.
    */
  val ivfPqJoinLiteralLimit = 32

  /** Per-subspace centroid table: cents(s)(c)(d) = component d of
    * centroid c in subspace s, from the first `pqCentroids` corpus
    * vectors by id. Bounded driver state (16 rows), like E3's seeds.
    */
  private def pqCentroidTable(e: DataFrame, dim: Int): Array[Array[Array[Double]]] = {
    val seeds = e.orderBy(col("vec_id")).limit(pqCentroids)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.length == pqCentroids,
      s"corpus has fewer than $pqCentroids non-zero vectors to seed PQ")
    require(dim % pqSubspaces == 0, s"dim $dim not divisible by $pqSubspaces")
    val sub = dim / pqSubspaces
    Array.tabulate(pqSubspaces)(s =>
      seeds.map(v => v.slice(s * sub, (s + 1) * sub)))
  }

  /** ‖cent_s_c‖² table, driver-computed with the same left-to-right
    * fold as the SQL oracle — shared by the encode (distance expansion)
    * and the ADC norm term.
    */
  private def pqNsqTable(cents: Array[Array[Array[Double]]]): Array[Array[Double]] =
    Array.tabulate(pqSubspaces, pqCentroids) { (s, c) =>
      var acc = 0.0
      var d = 0
      while (d < cents(s)(c).length) { acc += cents(s)(c)(d) * cents(s)(c)(d); d += 1 }
      acc
    }

  /** Per-subspace query→codebook dot tables — dotTab(s)(c) =
    * dot(q_s, cent_s_c), the driver-side LEFT-TO-RIGHT fold every ADC
    * consumer shares. The fold order is an oracle-parity contract (it
    * mirrors the oracle's list_reduce), so the loop exists exactly once
    * (like [[pqEncodeCarrying]]/[[adcScored]] for the row-side math).
    */
  private def adcDotTable(q: Array[Double],
                          book: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val sub = book(0)(0).length
    Array.tabulate(pqSubspaces, pqCentroids) { (s, c) =>
      var acc = 0.0
      var d = 0
      while (d < sub) { acc += q(s * sub + d) * book(s)(c)(d); d += 1 }
      acc
    }
  }

  /** The seeded codebook as a public value (for composing with
    * [[quantizePqWith]]/[[pqTopKWith]] and for the error-comparison
    * spec).
    */
  def pqSeededCodebook(embeddings: DataFrame, dim: Int = 64): Array[Array[Array[Double]]] =
    pqCentroidTable(withNorm(embeddings), dim)

  /** Learned PQ codebooks: `m` independent MLlib k-means fits, one per
    * subspace over its subvector slices — the production alternative to
    * the seeded table (k-means directly minimizes the quantization
    * error the encode argmin measures). Returns the same
    * cents(s)(c)(d) shape, so encode/ADC compose unchanged
    * ([[quantizePqWith]]/[[pqTopKWith]]). Driver state is m×16 small
    * centers; the fits are the only corpus passes.
    */
  def fitPqKmeans(embeddings: DataFrame, dim: Int = 64): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % pqSubspaces == 0, s"dim $dim not divisible by $pqSubspaces")
    val sub = dim / pqSubspaces
    val e = withNorm(embeddings)
    Array.tabulate(pqSubspaces) { s =>
      val fv = e.select(array_to_vector(
        slice(col("embedding"), s * sub + 1, sub).cast("array<double>")).as("fv"))
      new KMeans().setK(pqCentroids).setSeed(42L + s).setMaxIter(10)
        .setFeaturesCol("fv").fit(fv)
        .clusterCenters.map(_.toArray)
    }
  }

  /** E26 (OPQ-lite): the number of fixed Householder reflections in the
    * seeded orthogonal rotation applied before the PQ subspace split.
    * Full OPQ learns the rotation that minimizes quantization error;
    * this is the deterministic middle ground — a FIXED energy-spreading
    * rotation that mixes every coordinate into every subspace (the
    * corpus's per-coordinate scale structure no longer aligns with the
    * subspace boundaries) at identical code size and identical serve
    * cost, and, unlike a learned rotation, fully oracle-able.
    *
    * DOES IT EARN ITS KEEP (the d21 honesty standard, measured round
    * 11 on the generated corpus): NO — plain PQ is the better default
    * here. sf0.1: mean recon cosine 0.5636 (pq_opq) vs 0.5652 (pq),
    * recall@20 0.2 vs 0.3; sf0.01: +0.0016 mean cosine, one extra hit
    * in a single 20-item query — noise. The theory says exactly this:
    * a FIXED rotation pays off only when per-coordinate scale
    * structure aligns with subspace boundaries, and the generated
    * embeddings are near-isotropic, so spreading energy changes
    * nothing while the worst-vector reconstruction degrades. The
    * operator stays (the plan shape, the staged-rotation seam and the
    * oracle pattern are what a learned-OPQ deployment needs; on real
    * block-structured embeddings the decision can flip), but
    * [[opqRecallReport]] is the gate to run per corpus — do not route
    * a workload through the rotation without it.
    */
  private val opqReflections = 4

  /** Reflection vector i: integer components in [−8, 7] derived from
    * md5("opq:i:d") — the §6b md5-derived-constants trick, computed
    * ONCE driver-side and interpolated as literals into both the Spark
    * plan and the DuckDB oracle (one generator, so the two sides
    * cannot diverge). Integer u keeps u·u exact and every rotation
    * step a fixed-count IEEE chain (mult, sub, one division by an
    * integer literal) — engine-portable with no fold-order ceremony
    * beyond the spelled left-to-right u·x.
    */
  private[graft] def opqU(i: Int, dim: Int = 64): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      val h = md.digest(s"opq:$i:$d".getBytes("UTF-8"))
      (h(0) & 0xf) - 8
    }
  }

  /** Apply the fixed reflection chain: x ← x − (2·(u·x)/(u·u))·u per
    * reflection, in index order. Expression-shape notes (both traps
    * hit while building this):
    *  - NOT unrolled per-component: a 64-term unrolled fold × 4 stages
    *    fused into one whole-stage-codegen method blows the JVM's
    *    64 KB method limit (janino "Code grows beyond 64 KB", which
    *    Spark 4 surfaces as an internal error instead of falling
    *    back). Single-level higher-order functions instead — they run
    *    interpreted (bounded per-row work, one level, never the
    *    nested-HOF 4 ms/row trap of the first PQ encode) and keep the
    *    generated code tiny.
    *  - The coef alias never appears inside a LAMBDA BODY (the §6b
    *    single-reference-consumer inline trap, and a passthrough
    *    column would just get column-pruned away): it enters as
    *    array_repeat(coef, dim) — a plain child, evaluated once per
    *    row — and the update is zip_with over (emb, coef·u), lambdas
    *    referencing only their own variables.
    *  - The output is MATERIALIZED ([[Stage.checkpointFresh]]) before
    *    any consumer sees it. Even with coef top-level, CollapseProject
    *    inlines each single-referenced stage into the next, the emb
    *    subtree doubles per reflection (emb enters both the coef fold
    *    and the update zip_with), and the PQ encode's
    *    transform/slice lambda then inlines the WHOLE rotation tree as
    *    a single-reference consumer — round 10 measured a ~225 MiB
    *    serialized task binary that OOMed an 8 GiB test JVM and timed
    *    out the bench. The barrier turns the rotated corpus into a
    *    `Scan ExistingRDD` leaf, so every downstream plan (encode, ADC,
    *    recon) is its own fixed size — which is also the honest 100 TB
    *    shape: OPQ systems (e.g. FAISS) store rotated vectors at index
    *    build and never re-derive the rotation per query.
    * The close casts back to float (CAST AS REAL ↔ cast("float") has
    * §6b parity), making the rotated corpus a drop-in source for the
    * whole PQ serve family.
    */
  def opqRotate(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    var cur = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    (0 until opqReflections).foreach { i =>
      val u = opqU(i, dim)
      val uu = u.map(x => x.toLong * x).sum
      require(uu > 0, s"opq reflection $i degenerate")
      val uLit = typedLit(u.map(_.toDouble).toSeq)
      val ud = aggregate(zip_with(col("emb"), uLit, (x, uv) => x * uv),
        lit(0.0), (acc, t) => acc + t)
      cur = cur
        .select(col("vec_id"), col("emb"),
          (lit(2.0) * ud / lit(uu.toDouble)).as("coef"))
        .select(col("vec_id"),
          zip_with(col("emb"),
            zip_with(uLit, array_repeat(col("coef"), dim), (uv, c) => c * uv),
            (x, s) => x - s).as("emb"))
    }
    Stage.checkpointFresh(
      cur.select(col("vec_id"), col("emb").cast("array<float>").as("embedding")))
  }

  /** E26: seeded-PQ/ADC search over the ROTATED corpus — e8's exact
    * machinery (codebook seeding, encode argmin, ADC lookups) applied
    * after [[opqRotate]]: the rotation is one bounded per-row
    * expression chain ahead of the same fixed-size plan, so the scale
    * story is e8's. Scores are cosines in the rotated space (an
    * orthogonal map preserves the true cosines; only the QUANTIZATION
    * changes), so recall grades directly against the unrotated exact
    * top-k — which is what [[opqRecallReport]] does.
    */
  def opqPqTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                dim: Int = 64): DataFrame = {
    val rot = opqRotate(embeddings, dim)
    pqTopKWith(rot, pqCentroidTable(withNorm(rot), dim), queryVecId, k)
  }

  /** E26 recall grade: recall@k of the unrotated (e8) and rotated
    * (e26) PQ retrievals against the exact cosine top-k, side by side
    * — the decision row for "is the rotation worth it on THIS corpus".
    * All three lists are bounded (k rows); the joins are k-row
    * semi-joins (e24's shape).
    */
  def opqRecallReport(embeddings: DataFrame, queryVecId: Long = 0L,
                      k: Int = 20): DataFrame = {
    val exact = cosineTopK(embeddings, queryVecId, k).select(col("vec_id"))
    def grade(ann: DataFrame, codec: String) =
      ann.select(col("vec_id")).join(exact, Seq("vec_id"))
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(codec).as("codec"), lit(k.toLong).as("k"),
          col("n_hit"),
          (col("n_hit").cast("double") / lit(k.toDouble)).as("recall"))
    grade(pqTopK(embeddings, queryVecId, k), "pq")
      .unionByName(grade(opqPqTopK(embeddings, queryVecId, k), "pq_opq"))
  }

  /** (vec_id, codes): `m` 4-bit codes per vector — per subspace, the
    * argmin over centroids of `‖c‖² − 2·x_s·c` (the squared-L2 argmin
    * with the constant ‖x_s‖² term dropped), first-min tie ⇒ lowest
    * code. Each x_s·c is one native codegen'd [[dot]] against a literal
    * centroid subvector — NO per-component lambda loops: the earlier
    * nested-HOF distance fold ran interpreted at ~4 ms/row (hopeless
    * for an index build over billions of vectors); this form encodes at
    * scan speed. Three projections (subvectors → 16-entry distance
    * arrays → argmin) so nothing re-evaluates (§6b).
    */
  def quantizePq(embeddings: DataFrame, dim: Int = 64): DataFrame =
    quantizePqWith(embeddings, pqCentroidTable(withNorm(embeddings), dim))

  /** [[quantizePq]] with an explicit codebook (seeded or k-means-learned).
    * Learned centers are not exact floats, so the literal subvectors are
    * float-rounded for the native dot — immaterial for the learned path
    * (no oracle contract) and a no-op for the seeded one (data floats).
    */
  def quantizePqWith(embeddings: DataFrame,
                     cents: Array[Array[Array[Double]]]): DataFrame =
    pqEncodeCarrying(embeddings, cents, Nil)

  /** The PQ encode (codebook argmin → codes) with extra columns carried
    * through — shared by the plain encode ([[quantizePqWith]]), the
    * IVF-routed search ([[ivfPqTopK]], carrying `cell`), and the
    * persisted IVF-PQ index build ([[buildIvfPqIndex]]), so the encode
    * arithmetic exists exactly once. Round 15 swapped the three staged
    * HOF projections (slice subvectors → 16-entry distance arrays →
    * array_position argmin) for the native codegen'd
    * [[graft.functions.PqEncode]] — one tight S×C×sub loop per row,
    * bit-identical by the expression's parity contract (same
    * left-to-right float dots, same nsq − 2·dot distances, same
    * lowest-index tie-break), ~100× cheaper per row: the interpreted
    * staging measured ~250 µs/row at sf1, the dominant cost of every
    * PQ consumer. The codebook rides as ONE literal pair (float-rounded
    * subvectors + exact-double ‖c‖² table) instead of 128 per-centroid
    * literals.
    */
  private def pqEncodeCarrying(df: DataFrame,
                               cents: Array[Array[Array[Double]]],
                               carry: Seq[String]): DataFrame = {
    val nsq = pqNsqTable(cents)
    val bookLit = typedLit(cents.map(_.map(_.map(_.toFloat).toSeq).toSeq).toSeq)
    val nsqLit = typedLit(nsq.map(_.toSeq).toSeq)
    val carryCols = carry.map(col)
    df.select((col("vec_id") +: carryCols) :+
      graft.functions.VectorFunctions
        .pqEncode(col("embedding"), bookLit, nsqLit).as("codes"): _*)
  }

  /** The ADC close (both table-lookup folds in ONE projection, the
    * plan-build zero-norm guard, score, top-k) over a codes relation —
    * shared by [[pqTopKWith]], [[searchPqIndex]], [[ivfPqTopK]], and
    * [[probeIvfPqIndex]] so the serving arithmetic exists exactly once.
    */
  private def adcScored(codes: DataFrame, dotTab: Array[Array[Double]],
                        nsqTab: Array[Array[Double]], qNrm: Double, k: Int,
                        carry: Seq[String]): DataFrame = {
    val dotLit = typedLit(dotTab.map(_.toSeq).toSeq)
    val nsqLit = typedLit(nsqTab.map(_.toSeq).toSeq)
    val carryCols = carry.map(col)
    // native codegen'd gather-sum (round-15): bit-identical left-to-
    // right fold to the old interpreted-HOF form, ~100× cheaper per row
    val adc = codes.select((col("vec_id") +: carryCols) ++ Seq(
      graft.functions.VectorFunctions.adcSum(dotLit, col("codes"))
        .as("adc_dot"),
      graft.functions.VectorFunctions.adcSum(nsqLit, col("codes"))
        .as("adc_nsq")): _*)
    val guarded =
      if (nsqTab.exists(_.exists(_ <= 0))) adc.filter(col("adc_nsq") > 0)
      else adc
    guarded
      .select((col("vec_id") +: carryCols) :+
        (col("adc_dot") / (sqrt(col("adc_nsq")) * lit(qNrm))).as("score"): _*)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: the
    * query precomputes per-subspace lookup tables — dot(q_s, cent_s_c)
    * and ‖cent_s_c‖² — and each candidate's approximate cosine is m
    * table lookups summed, never a reconstruction: the serving shape
    * of a PQ index (codes: 1/16th the corpus bytes; per-row work: m
    * adds). Exact-query, approximate-corpus, like [[sq8TopK]].
    */
  def pqTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
             dim: Int = 64): DataFrame =
    pqTopKWith(embeddings, pqCentroidTable(withNorm(embeddings), dim),
      queryVecId, k)

  /** PQ/ADC search with LEARNED codebooks ([[fitPqKmeans]]) — same
    * encode and table-lookup machinery over the k-means centers.
    * Rows-only (k-means init order is engine-private); the spec asserts
    * the learned codebook's quantization error beats the seeded one.
    */
  def pqTopKLearned(embeddings: DataFrame, queryVecId: Long, k: Int,
                    dim: Int = 64): DataFrame =
    pqTopKWith(embeddings, fitPqKmeans(embeddings, dim), queryVecId, k)

  /** E8 learned fit, the PORTABLE form — [[lloydCentroids]]' recipe
    * applied per subspace: init = the seeded table, assignment = the
    * PRODUCTION encode ([[pqEncodeCarrying]] over the current book —
    * argmin of ‖c‖² − 2·q·c with the book float-rounded for the native
    * dot, exactly what serving does), update = per-(subspace, code,
    * dim) means through floor-quantized BIGINT sums and one double
    * division; empty cells keep their centroid. Because Lloyd starts
    * AT the seeded book and each step cannot increase quantization
    * error, the learned book provably beats (or ties) the seeded one —
    * asserted in SimilaritySpec — while staying bit-portable:
    * [[lloydPqSql]] mirrors every fold, so e8's learned path earns the
    * full oracle MLlib's k-means‖ cannot.
    */
  def fitPqLloyd(embeddings: DataFrame, dim: Int = 64,
                 iters: Int = 2): Array[Array[Array[Double]]] = {
    require(dim % pqSubspaces == 0, s"dim $dim not divisible by $pqSubspaces")
    val sub = dim / pqSubspaces
    val e = withNorm(embeddings)
    var book = pqCentroidTable(e, dim)
    for (_ <- 1 to iters) {
      val agg = pqEncodeCarrying(e, book, Seq("embedding"))
        .select(col("embedding"), posexplode(col("codes")).as(Seq("s", "cell")))
        .select(col("s"), col("cell"),
          slice(col("embedding"), col("s") * sub + 1, lit(sub)).as("sv"))
        .select(col("s"), col("cell"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy(col("s"), col("cell"), col("d"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * lit(1.0e9))).as("sq"))
        .collect()
      val byCell = agg.groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("cell")))
      book = Array.tabulate(pqSubspaces, pqCentroids) { (s, c) =>
        byCell.get((s, c)) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("d")).map { r =>
              r.getAs[Long]("sq").toDouble /
                (r.getAs[Long]("n").toDouble * 1.0e9)
            }
          case None => book(s)(c)
        }
      }
    }
    book
  }

  /** E8, the oracle-checked learned form: ADC search over the
    * [[fitPqLloyd]] book. [[pqTopKLearned]] keeps MLlib for corpora
    * where sampled init matters.
    */
  def pqTopKLloyd(embeddings: DataFrame, queryVecId: Long, k: Int,
                  dim: Int = 64): DataFrame =
    pqTopKWith(embeddings, fitPqLloyd(embeddings, dim), queryVecId, k)

  /** [[pqTopK]] with an explicit codebook (seeded or learned). */
  def pqTopKWith(embeddings: DataFrame, cents: Array[Array[Array[Double]]],
                 queryVecId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val qRows = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).take(1)
    if (qRows.isEmpty) {
      return e.select(col("vec_id"), lit(0.0).as("score")).limit(0)
    }
    val qVec = qRows(0).getSeq[Float](0).map(_.toDouble).toArray
    val qNrm = qRows(0).getDouble(1)
    val dotTab = adcDotTable(qVec, cents)
    val nsqTab = pqNsqTable(cents)
    // BOTH ADC folds live in ONE projection (inside adcScored): each
    // references `codes` once, and two references together keep
    // CollapseProject from inlining the (expensive) encode expression
    // into the lambdas — as chained withColumns the single-referenced
    // alias gets inlined and the full argmin encode re-evaluates per
    // table lookup (measured 8.4s vs 1s at sf0.1; the §6b HOF-staging
    // rule applied across a helper boundary). The zero-norm guard is a
    // PLAN-BUILD decision there too: when every centroid has positive
    // norm (the normal case) adc_nsq > 0 is a tautology and the row
    // filter is omitted — as an expression filter it predicate-pushes
    // below the projections and re-evaluates the whole encode chain per
    // row in an interpreted Filter (measured 30s vs ~1s at sf0.1). The
    // oracle's WHERE adc_nsq > 0 then passes every row identically.
    adcScored(
      quantizePqWith(embeddings, cents).filter(col("vec_id") =!= queryVecId),
      dotTab, nsqTab, qNrm, k, Nil)
  }

  /** E21: PQ shortlist + exact refine — the FAISS `IndexRefineFlat`
    * serve shape, and the PQ sibling of [[sq8Rerank]]: ADC ranks the
    * corpus from 4-bit codes (never touching a float vector), the top
    * `kShort` survivors are re-scored EXACTLY from their stored
    * embeddings, and the final top-`k` orders by the exact cosine.
    * This repairs ADC's quantization misranking near the decision
    * boundary for the price of `kShort` exact dot products — the
    * standard accuracy/latency knob between pure PQ (e8) and exact
    * (e1), and the spec pins the semantic contract: every refined
    * score is bit-identical to [[cosineTopK]]'s exact score for that
    * id, and the result ordering is the exact ordering restricted to
    * the shortlist.
    *
    * Plan: the kShort-row shortlist BROADCASTS into a hash join
    * against the corpus scan, so the rescore "gather" costs one
    * columnar pass that keeps kShort rows — at 100 TB the persisted
    * composition reads codes for the ranking pass and an id-pruned
    * slice of the float table for the gather; the float corpus never
    * fully materializes on the serve path of either pass.
    */
  def pqRefineTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                   kShort: Int = 20, dim: Int = 64): DataFrame = {
    val shortlist = pqTopK(embeddings, queryVecId, kShort, dim)
      .select(col("vec_id"))
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    e.join(broadcast(shortlist), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
          .as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E8 persisted form: encode ONCE, store (vec_id, codes) — 1/16th the
    * float corpus — plus the centroid table; ADC-search many. The
    * centroids persist alongside so a search needs no corpus access at
    * all: query tables come from the stored (tiny) centroid parquet.
    */
  def buildPqIndex(embeddings: DataFrame, dir: String, dim: Int = 64): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = pqCentroidTable(withNorm(embeddings), dim)
    cents.zipWithIndex.flatMap { case (subCents, s) =>
      subCents.zipWithIndex.map { case (cv, c) => (s, c, cv.toSeq) }
    }.toSeq.toDF("s", "c", "cent")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    quantizePq(embeddings, dim).write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** E22: persist the PQ index WITH a flat float sidecar — FAISS's
    * IndexRefineFlat made durable. The ranking pass reads only the
    * code rows; the rescore gather reads the sidecar id-pruned (see
    * [[searchPqRefineIndex]]).
    */
  def buildPqRefineIndex(embeddings: DataFrame, dir: String,
                         dim: Int = 64): Unit = {
    buildPqIndex(embeddings, dir, dim)
    embeddings.write.mode("overwrite").parquet(s"$dir/flat")
  }

  /** E22 serve path: ADC over the stored codes ranks (8 B/vector, no
    * float access), the top-`kShort` ids come back to the driver (a
    * bounded model, e10's class), and the exact rescore reads the flat
    * sidecar through a PUSHED `In(vec_id, ...)` filter — the float
    * corpus is never fully materialized on either pass, which is the
    * claim [[pqRefineTopK]]'s scaladoc makes and the spec proves here
    * (PushedFilters reaching the parquet reader + results bit-equal to
    * the in-plan refine). At 100 TB the sidecar would additionally be
    * bucketed by vec_id (A12) so the gather prunes files, not just row
    * groups.
    */
  def searchPqRefineIndex(spark: SparkSession, dir: String,
                          qVec: Array[Float], k: Int, kShort: Int = 20,
                          excludeVecId: Option[Long] = None): DataFrame = {
    val ids = searchPqIndex(spark, dir, qVec, kShort, excludeVecId)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val q = qVec.map(_.toDouble)
    var acc = 0.0
    var i = 0
    while (i < q.length) { acc += q(i) * q(i); i += 1 }
    val qNrm = math.sqrt(acc)
    val flat = withNorm(spark.read.parquet(s"$dir/flat")
      .filter(col("vec_id").isin(ids.map(x => x: Any): _*)))
    flat
      .select(col("vec_id"),
        (dot(col("embedding"), typedLit(qVec.toSeq)) /
          (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** ADC search over a persisted PQ index with a full-precision query
    * vector: a codes-only scan (8 bytes of codes per vector) — the
    * float corpus is never read. Same scoring as [[pqTopK]].
    */
  def searchPqIndex(spark: SparkSession, dir: String, qVec: Array[Float],
                    k: Int, excludeVecId: Option[Long] = None): DataFrame = {
    val cents = Array.ofDim[Array[Double]](pqSubspaces, pqCentroids)
    spark.read.parquet(s"$dir/centroids").collect().foreach { r =>
      cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    val sub = cents(0)(0).length
    val q = qVec.map(_.toDouble)
    require(q.length == pqSubspaces * sub, s"query dim ${q.length} != index dim")
    val qNrm = math.sqrt(q.map(x => x * x).sum)
    require(qNrm > 0, "query vector has zero norm")
    val dotTab = adcDotTable(q, cents)
    val nsqTab = pqNsqTable(cents)
    val codes = spark.read.parquet(s"$dir/codes")
    val filtered = excludeVecId
      .map(id => codes.filter(col("vec_id") =!= id)).getOrElse(codes)
    // codes here is a SCAN attribute (no encode to re-evaluate), but the
    // ADC shape mirrors pqTopK: one projection for both folds, and the
    // zero-norm guard only when a zero-norm centroid exists.
    adcScored(filtered, dotTab, nsqTab, qNrm, k, Nil)
  }

  /** E16: persisted IVF-PQ index — [[buildIvfIndex]]'s cell-partitioned
    * layout composed with [[buildPqIndex]]'s code storage: the corpus is
    * routed and encoded ONCE, and what lands on disk is (vec_id, codes)
    * partitioned BY CELL plus the two tiny model tables (IVF centroids,
    * PQ codebook). A probe routes through the collected centroid table
    * to its nProbes cells and ADC-scans ONLY those cell directories —
    * partition pruning × 8-byte codes: probe I/O is
    * nProbes/nCentroids × 1/16th of the float corpus, and the floats
    * are never read at serve time. This is the durable form of
    * [[ivfPqTopK]], which computes the same route+encode inline.
    */
  def buildIvfPqIndex(embeddings: DataFrame, dir: String,
                      nCentroids: Int = 16, dim: Int = 64): Unit = {
    val e = withNorm(embeddings)
    val cents = seedCentroids(e, nCentroids)
    val spark = embeddings.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case ((cv, cn), i) => (i, cv.toSeq, cn) }.toSeq
      .toDF("cent_id", "embedding", "nrm")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val book = pqCentroidTable(e, dim)
    book.zipWithIndex.flatMap { case (subCents, s) =>
      subCents.zipWithIndex.map { case (cv, c) => (s, c, cv.toSeq) }
    }.toSeq.toDF("s", "c", "cent")
      .write.mode("overwrite").parquet(s"$dir/codebook")
    pqEncodeCarrying(assignCells(e, cents), book, Seq("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** Probe a persisted IVF-PQ index with an external query vector — the
    * fully pruned serve path (see [[buildIvfPqIndex]]): centroid and
    * codebook tables collect driver-side (tiny model rows), the probe
    * cells come from [[probeCellsFor]], and the scan touches only those
    * cells' code files. Same scoring and ordering as [[ivfPqTopK]].
    */
  def probeIvfPqIndex(spark: SparkSession, dir: String, qVec: Array[Float],
                      k: Int, nProbes: Int = 2,
                      excludeVecId: Option[Long] = None): DataFrame = {
    val cents = readCentroids(spark, dir)
    val book = Array.ofDim[Array[Double]](pqSubspaces, pqCentroids)
    spark.read.parquet(s"$dir/codebook").collect().foreach { r =>
      book(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    val sub = book(0)(0).length
    val q = qVec.map(_.toDouble)
    require(q.length == pqSubspaces * sub, s"query dim ${q.length} != index dim")
    val qNrm = math.sqrt(q.map(x => x * x).sum)
    require(qNrm > 0, "query vector has zero norm")
    val probeCells = probeCellsFor(cents, qVec, qNrm, nProbes)
    val dotTab = adcDotTable(q, book)
    val nsqTab = pqNsqTable(book)
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(probeCells: _*))
      .withColumn("cell", col("cell").cast("int"))
    val filtered = excludeVecId
      .map(id => codes.filter(col("vec_id") =!= id)).getOrElse(codes)
    adcScored(filtered, dotTab, nsqTab, qNrm, k, Seq("cell"))
  }

  /** E15: IVF-PQ — the composed serve path of a production vector index
    * (the FAISS IVFPQ shape): route the query to its `nProbes` closest
    * IVF cells, then ADC-score ONLY the vectors assigned to those cells
    * over their 4-bit PQ codes. Both the cell assignment (argmax over
    * literal centroid cosines) and the PQ encode (argmin over literal
    * sub-centroid distances) are pure per-row projections — no join, no
    * shuffle before the final top-k merge, so the whole search is one
    * codegen'd corpus pass ending in TakeOrderedAndProject. At 100 TB
    * the persisted form composes [[buildIvfIndex]]'s cell-partitioned
    * layout with [[buildPqIndex]]'s codes: a probe reads 8 B/vector from
    * nProbes/nCentroids of the corpus — the float vectors are never
    * touched at serve time.
    *
    * Shares e3's routing arithmetic ([[seedCentroids]]/[[assignCells]]/
    * [[probeCellsFor]]) and e8's codebook + ADC staging verbatim, so the
    * oracle is the two oracle CTE chains composed on vec_id — the same
    * 16 seed vectors serve as IVF centroids AND PQ codebook seeds, and
    * the ADC score of a vec_id is bit-identical to [[pqTopK]]'s
    * (routing prunes candidates; it never changes a score).
    */
  def ivfPqTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                nCentroids: Int = 16, nProbes: Int = 2,
                dim: Int = 64): DataFrame = {
    val e = withNorm(embeddings)
    val cents = seedCentroids(e, nCentroids)
    val qRows = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).take(1)
    if (qRows.isEmpty) {
      return e.select(col("vec_id"), lit(0).as("cell"), lit(0.0).as("score")).limit(0)
    }
    val qVecF = qRows(0).getSeq[Float](0).toArray
    val qVec = qVecF.map(_.toDouble)
    val qNrm = qRows(0).getDouble(1)
    val probeCells = probeCellsFor(cents, qVecF, qNrm, nProbes)
    val book = pqCentroidTable(e, dim)
    val nsqTab = pqNsqTable(book)
    val dotTab = adcDotTable(qVec, book)
    // stage 1: route — per-row argmax cell against literal centroids,
    // pruned to the query's probe cells. NOTE: `cell` is a DERIVED
    // argmax, not a scan attribute — predicate pushdown inlines the
    // 16-cosine routing expression into a Filter below assignCells'
    // projection and the projection recomputes it for survivors, so the
    // routing runs ~2× per row here. That is the right trade: it prunes
    // the far-more-expensive encode (16×16 dots + argmins) to the probe
    // cells. Only the persisted form ([[probeIvfPqIndex]]) gets true
    // partition pruning.
    val routed = assignCells(e, cents)
      .filter(col("vec_id") =!= queryVecId)
      .filter(col("cell").isin(probeCells: _*))
    // stages 2–5: e8's shared encode/ADC staging with `cell` carried
    adcScored(pqEncodeCarrying(routed, book, Seq("cell")),
      dotTab, nsqTab, qNrm, k, Seq("cell"))
  }

  /** E17: batch IVF-PQ kNN JOIN — [[knnJoin]]'s many-query shape on
    * [[ivfPqTopK]]'s serve path: the offline "kNN for every probe
    * vector" job (embedding-dedup across corpora, eval-set neighbor
    * mining) where the exact crossJoin's |corpus|×|queries| scoring is
    * the scale killer. One corpus pass routes + encodes every vector
    * (the shared staging), then each row EXPLODES to only the queries
    * probing its cell via a literal cell→queries routing table — a
    * corpus row is copied at most |queries| times, carries a ~10-byte
    * code tuple (never the embedding), and a cell no query probes
    * drops at the explode. ADC tables for all queries ride one literal
    * 3-D array indexed by the exploded query ordinal; the final
    * per-query top-k is e5's `row_number <= k` WindowGroupLimit shape,
    * so the exchange carries O(k × queries × partitions). Expected
    * candidate volume: |queries| × nProbes/nCentroids × corpus —
    * the IVF routing's pruning applied to the join, not just the
    * point lookup.
    */
  /** Candidate-pair cardinality of the [[ivfPqKnnJoin]] ADC scan — the
    * pair-density instrument (round-13 verdict: the e17/pair-graph
    * family moved 2× on a corpus regeneration alone, and the bench
    * record needs the DENSITY beside the TIMING so a corpus move and a
    * plan regression are distinguishable data, not prose). Exactly the
    * (query, vector) pairs the join's candidate stage evaluates:
    * Σ_cell rows(cell) × queriesProbing(cell), minus the per-query
    * self-hit (a query's own row always sits in its nearest — hence
    * probed — cell and is self-excluded by the join). Driver state is
    * bounded model state only: the centroid table and one 16-row cell
    * histogram.
    */
  def ivfPqJoinCandidateCount(embeddings: DataFrame, queryIds: Seq[Long],
                              nCentroids: Int = 16, nProbes: Int = 2): Long = {
    val e = withNorm(embeddings)
    val cents = seedCentroids(e, nCentroids)
    val qRows = e.filter(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .collect().sortBy(_.getLong(0))
    if (qRows.isEmpty) return 0L
    val probes = qRows.map(r => probeCellsFor(cents,
      r.getSeq[Float](1).toArray, r.getDouble(2), nProbes))
    val qPerCell = (0 until nCentroids).map(c => probes.count(_.contains(c)).toLong)
    val cellRows = assignCells(e, cents).groupBy(col("cell"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until nCentroids).map(c => cellRows.getOrElse(c, 0L) * qPerCell(c)).sum -
      qRows.length
  }

  def ivfPqKnnJoin(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                   nCentroids: Int = 16, nProbes: Int = 2,
                   dim: Int = 64,
                   literalBatchLimit: Int = ivfPqJoinLiteralLimit): DataFrame = {
    val e = withNorm(embeddings)
    val cents = seedCentroids(e, nCentroids)
    val book = pqCentroidTable(e, dim)
    val nsqTab = pqNsqTable(book)
    val qRows = e.filter(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .collect().sortBy(_.getLong(0))
    if (qRows.isEmpty) {
      return e.select(col("vec_id").as("q_id"), col("vec_id"),
        lit(0).as("cell"), lit(0.0).as("score"), lit(0).as("rnk")).limit(0)
    }
    val qIds = qRows.map(_.getLong(0))
    val qVecs = qRows.map(_.getSeq[Float](1).toArray)
    val qNrms = qRows.map(_.getDouble(2))
    // per-query ADC dot tables through the one shared fold
    val dotTabs = qVecs.map(qv => adcDotTable(qv.map(_.toDouble), book))
    val probes = qIds.indices.map(i =>
      probeCellsFor(cents, qVecs(i), qNrms(i), nProbes))
    // cell → probing-query ordinals: the routing table, shipped as a
    // literal (nCentroids × ≤|queries| ints)
    val cellQ = (0 until nCentroids).map(c =>
      probes.zipWithIndex.collect { case (cs, qi) if cs.contains(c) => qi }.toSeq)
    // rows in cells NO query probes would pay the full encode only to
    // explode to zero rows — the probed-cell union is driver-known, so
    // prune BEFORE the encode stage (and omit the filter entirely when
    // the union covers every cell: the plan-build tautology rule). The
    // re-evaluated routing the pushed filter costs (see [[ivfPqTopK]])
    // is 16 dots vs the 256 the encode would spend on a dropped row.
    val probedCells = cellQ.zipWithIndex.collect {
      case (qs, c) if qs.nonEmpty => c
    }
    val routedAll = assignCells(e, cents)
    val routed =
      if (probedCells.size < nCentroids)
        routedAll.filter(col("cell").isin(probedCells.map(x => x: Any): _*))
      else routedAll
    // The candidate stage downstream is AMPLIFIED ~|queries| ×
    // nProbes/nCentroids over the corpus scan, but without an exchange
    // it runs at the SCAN's partition count — sized for reading bytes,
    // not for the amplified ADC CPU (sf1: a one-file embeddings table
    // planned 2 tasks under 32 cores, and the whole join ran 18× its
    // quiet reading). Past the literal threshold the amplification is
    // ≥4×: one corpus-row shuffle (vec_id hash into the session's
    // shuffle parallelism) spreads encode + ADC across the cluster. At
    // point-batch scale (≤ literalBatchLimit) the amplification is ~1×
    // and the exchange would cost more than it buys — skip it. The
    // partition count is EXPLICIT (REPARTITION_BY_NUM): AQE coalesces a
    // column-only repartition back down by its BYTE size, which is
    // exactly wrong here — the exchange is small by construction, the
    // stage above it is the amplified one.
    val balanced =
      if (qIds.length > literalBatchLimit)
        routed.repartition(
          e.sparkSession.sessionState.conf.numShufflePartitions,
          col("vec_id"))
      else routed
    val coded = pqEncodeCarrying(balanced, book, Seq("cell"))
    if (qIds.length <= literalBatchLimit) {
      // LITERAL path (small batch): per-query ADC dot tables +
      // cell→query routing ride the plan as literals — zero joins
      // before top-k, the right call while |queries|×8×16 doubles
      // stay trivially plan-sized.
      val qlist = typedLit(cellQ.toSeq)
      val qidLit = typedLit(qIds.toSeq)
      val qnrmLit = typedLit(qNrms.toSeq)
      val dotLit3 = typedLit(dotTabs.map(_.map(_.toSeq).toSeq).toSeq)
      val cand = coded
        .select(col("vec_id"), col("cell"), col("codes"),
          explode(element_at(qlist, col("cell") + 1)).as("qi"))
        .filter(element_at(qidLit, col("qi") + 1) =!= col("vec_id"))
      ivfPqAdcJoinTail(cand, element_at(dotLit3, col("qi") + 1),
        element_at(qidLit, col("qi") + 1),
        element_at(qnrmLit, col("qi") + 1), nsqTab, k)
    } else {
      // BROADCAST path (production batch): past the threshold the
      // literal tables stop being bounded model state (plan size and
      // codegen scale with |queries|) — ship the routing and the
      // per-query model (q_id, norm, 8×16 ADC dot table) as two tiny
      // broadcast-joined relations keyed on (cell) and (query
      // ordinal). IDENTICAL arithmetic: the joined `dot` column feeds
      // the same fold the literal path runs, so both paths are
      // bit-equal (pinned by SimilaritySpec).
      val ss = embeddings.sparkSession
      val routingDf = ss.createDataFrame(cellQ.zipWithIndex.flatMap {
        case (qs, c) => qs.map(qi => (c, qi))
      }).toDF("cell", "qi")
      val queryDf = ss.createDataFrame(qIds.indices.map(i =>
        (i, qIds(i), qNrms(i), dotTabs(i).map(_.toSeq).toSeq)))
        .toDF("qi", "q_id", "q_nrm", "dot")
      val cand = coded
        .join(broadcast(routingDf), Seq("cell"))
        .join(broadcast(queryDf), Seq("qi"))
        .filter(col("q_id") =!= col("vec_id"))
      ivfPqAdcJoinTail(cand, col("dot"), col("q_id"), col("q_nrm"),
        nsqTab, k)
    }
  }

  /** The batch-ADC close shared by [[ivfPqKnnJoin]]'s literal and
    * broadcast paths: both table-lookup folds in ONE projection (the
    * §6b CollapseProject rule), the plan-build zero-norm guard, the
    * per-query `row_number <= k` top-k. The three accessor Columns
    * are the ONLY path difference — literal `element_at` lookups vs
    * broadcast-joined attributes — so the fold arithmetic (and with
    * it oracle parity) exists exactly once.
    */
  private def ivfPqAdcJoinTail(cand: DataFrame, dotOf: Column,
                               qIdOf: Column, qNrmOf: Column,
                               nsqTab: Array[Array[Double]],
                               k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nsqLit = typedLit(nsqTab.map(_.toSeq).toSeq)
    // native codegen'd gather-sums (round-15 — the verdict's e17 item):
    // the interpreted-HOF folds here ran per CANDIDATE row (|queries| ×
    // nProbes/nCentroids × corpus — the join's amplified stage) and
    // measured 35 s of the 38 s sf1 reading; the generated loop is the
    // same left-to-right fold, so the swap is oracle-hash-neutral.
    // dotOf may be a per-query lookup (literal path) or a broadcast-
    // joined attribute — both are array<array<double>> either way.
    val adc = cand.select(col("vec_id"), col("cell"), qIdOf.as("q_id"),
      qNrmOf.as("q_nrm"),
      graft.functions.VectorFunctions.adcSum(dotOf, col("codes"))
        .as("adc_dot"),
      graft.functions.VectorFunctions.adcSum(nsqLit, col("codes"))
        .as("adc_nsq"))
    val guarded =
      if (nsqTab.exists(_.exists(_ <= 0))) adc.filter(col("adc_nsq") > 0)
      else adc
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    guarded
      .select(col("q_id"), col("vec_id"), col("cell"),
        (col("adc_dot") / (sqrt(col("adc_nsq")) * col("q_nrm"))).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** E10: MMR-diversified top-k — re-rank the exact top-`nCand` pool so
    * results trade pure relevance for coverage: greedy argmax of
    *   λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
    * (Carbonell-Goldstein maximal marginal relevance — the standard fix
    * for a results page of near-identical neighbors, which in a dedup'd
    * training-data context means "give me k DIFFERENT exemplars near
    * this query", not k copies).
    *
    * Architecture: the candidate pool comes from the DISTRIBUTED exact
    * top-k (e1's plan: broadcast query row, one corpus scan, per-
    * partition top-k merge), then the inherently-SEQUENTIAL greedy runs
    * on the driver over ≤ nCand rows — bounded model state, the
    * IVF-centroid rule (never O(corpus) at the driver). The greedy's
    * arithmetic mirrors the oracle op-for-op: the same left-to-right
    * double fold as FloatVecDot for every dot product, unrounded IEEE
    * mult/sub for the MMR expression, ties broken by (mmr desc,
    * vec_id) — so the whole output hash-matches a recursive-CTE DuckDB
    * oracle despite the iterative selection.
    */
  def mmrDiversify(embeddings: DataFrame, queryVecId: Long, nCand: Int = 20,
                   k: Int = 10, lambda: Double = 0.7,
                   // an explicit literal, NOT 1.0 - lambda: Scala would
                   // compute IEEE 0.30000000000000004 while DuckDB folds
                   // the same subtraction in DECIMAL to exactly 0.3 — the
                   // one-ulp gap that breaks argmax parity (§6b)
                   mu: Double = 0.3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pool = cosineTopK(embeddings, queryVecId, nCand)
      .join(withNorm(embeddings).select(col("vec_id"), col("embedding"), col("nrm")),
        Seq("vec_id"))
      .select(col("vec_id"), col("score"), col("embedding"), col("nrm"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Double]("nrm")))
    // FloatVecDot's exact fold: left-to-right double accumulation
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def sim(a: (Long, Double, Array[Float], Double),
            b: (Long, Double, Array[Float], Double)): Double =
      fdot(a._3, b._3) / (a._4 * b._4)
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double, Double)] // (rank, vec_id, relevance, mmr)
    var chosen = List.empty[(Long, Double, Array[Float], Double)]
    var remaining = pool.toList
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val mmr =
          if (chosen.isEmpty) lambda * c._2
          else lambda * c._2 - mu * chosen.map(s => sim(c, s)).max
        (c, mmr)
      }
      // argmax by (mmr desc, vec_id asc) — the oracle's ORDER BY
      val (best, bestMmr) = scored.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && y._1._1 < x._1._1)) y else x
      }
      selected += ((selected.length + 1, best._1, best._2, bestMmr))
      chosen = best :: chosen
      remaining = remaining.filterNot(_._1 == best._1)
    }
    selected.toSeq.toDF("rank", "vec_id", "relevance", "mmr")
  }

  /** E14: ANN recall@k evaluation — the index-quality harness every
    * vector deployment runs before trusting an approximate index: each
    * ANN method's top-k (E2 LSH multi-probe, E3 IVF) is scored against
    * the exact E1 truth set for the same query, recall = |ANN ∩ exact|
    * / k. Both methods and the truth set are fully deterministic here
    * (md5-portable planes, seeded centroids), so the recall numbers
    * themselves are oracle-checkable — the oracle recomputes all three
    * lists in SQL and intersects them.
    *
    * The truth join is a k-row left-semi against k-row frames — the
    * evaluation itself costs nothing; the corpus cost is the three
    * retrievals. At 100 TB the same harness runs over a SAMPLED query
    * set (each query an independent broadcast probe against the
    * persisted index — E6's partition-pruned read), and the exact
    * truth pass is the one full scan you pay per evaluation batch,
    * amortized over all queries in it (e5's batch-kNN shape).
    */
  def annRecall(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 20): DataFrame = {
    val exact = cosineTopK(embeddings, queryVecId, k).select(col("vec_id"))
    Seq(("lsh", annTopK(embeddings, queryVecId, k)),
        ("ivf", ivfTopK(embeddings, queryVecId, k)))
      .map { case (name, ann) =>
        ann.select(col("vec_id"))
          .join(exact, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .select(lit(name).as("method"), lit(k.toLong).as("k"), col("n_hit"),
            (col("n_hit").cast("double") / k).as("recall"))
      }.reduce(_.unionByName(_))
  }

  /** E23: the IVF probe-count PLANNER sweep — e14's recall harness run
    * across nprobe ∈ {1,2,4,8,16} so the operator answers the question
    * every IVF deployment tunes by hand: how many cells buy the target
    * recall (d21's S-curve table is the LSH analogue; this is its IVF
    * sibling). Each sweep point is the EXACT e3 retrieval at that
    * probe count graded against the e1 truth set; nprobe = nCentroids
    * probes every cell, so that endpoint is provably recall 1.0 (the
    * routing-prunes-never-rescores invariant, spec'd along with
    * monotonicity in p).
    *
    * Cost honesty: run inline this is Σp/16 ≈ 2 corpus-equivalents of
    * scoring plus the exact pass. The production shape is the
    * PERSISTED index (e6): each sweep point scans only its p cell
    * partitions, and the exact pass is the one full scan per
    * evaluation batch (e14's amortization note).
    */
  def ivfProbeSweep(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 20,
                    probes: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val exact = cosineTopK(embeddings, queryVecId, k).select(col("vec_id"))
    probes.map { p =>
      ivfTopK(embeddings, queryVecId, k, nProbes = p).select(col("vec_id"))
        .join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(p.toLong).as("n_probes"), lit(k.toLong).as("k"),
          col("n_hit"), (col("n_hit").cast("double") / k).as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** The e23 sweep turned PLANNER (round-14 verdict item 5): the
    * smallest probe count whose measured recall@k meets `targetRecall`
    * against the exact truth set — the number an IVF deployment feeds
    * [[ivfPqKnnJoin]]/[[ivfTopK]] instead of a hand-fixed constant.
    * Falls back to probing every cell when no sweep point reaches the
    * target (the sweep's provable recall-1.0 endpoint). Driver state is
    * the ≤|probes|-row sweep result — bounded model state, and the
    * choice is deterministic (the sweep itself is the oracled e23), so
    * a query built from it stays oracle-expressible: the SQL twin picks
    * min(p) over the same sweep CTE. Cost honesty: the sweep is
    * Σp/nCentroids ≈ 2 corpus-equivalents + one exact pass — a PLANNING
    * cost paid once per corpus/index build, amortized over the query
    * batches it serves (e14's amortization note).
    */
  def planProbes(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 20,
                 targetRecall: Double = 0.95,
                 probes: Seq[Int] = Seq(1, 2, 4, 8, 16)): Int = {
    val sweep = ivfProbeSweep(embeddings, queryVecId, k, probes)
      .select(col("n_probes"), col("recall")).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    probes.sorted.find(p => sweep(p) >= targetRecall).getOrElse(probes.max)
  }

  /** E24: recall over a QUERY BATCH — e14's single-query harness in
    * its production shape: the batch IVF-PQ join (E17) graded per
    * query against the exact batch kNN (E5), giving the recall
    * DISTRIBUTION across queries rather than one number (the tail
    * query — a vector routed to a cell its neighbors aren't in — is
    * what a single-probe harness can't see). The corpus cost is the
    * two batch retrievals (each one corpus pass); the grading is a
    * semi-join of two ≤|queries|·k-row lists. Queries with zero hits
    * are kept by a left join against the query list — a dropped row
    * would read as "no data" where the honest value is recall 0 — and
    * that list is built from the DRIVER-KNOWN queryIds as a literal
    * relation, never by re-deriving distinct q_ids from the exact
    * result (a second consumer of the corpus-pass plan — the round-8
    * recompute class).
    */
  def batchRecall(embeddings: DataFrame, queryIds: Seq[Long] = 0L until 8L,
                  k: Int = 10): DataFrame = {
    val exact = knnJoin(embeddings, queryIds, k)
      .select(col("q_id"), col("vec_id"))
    val ann = ivfPqKnnJoin(embeddings, queryIds, k)
      .select(col("q_id"), col("vec_id"))
    val hits = ann.join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
    val qs = embeddings.sparkSession.range(1)
      .select(explode(array(queryIds.map(lit(_)): _*)).as("q_id"))
    qs.join(hits, Seq("q_id"), "left")
      .select(col("q_id"), lit(k.toLong).as("k"),
        coalesce(col("h"), lit(0L)).as("n_hit"),
        (coalesce(col("h"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** E25: quantizer reconstruction-error report — the b47/d17
    * estimate-vs-exact pattern for the vector codecs: per vector, the
    * cosine between the original and its SQ8 / PQ reconstruction (the
    * number that decides which codec a deployment can afford — SQ8 is
    * 4× smaller and near-lossless; PQ is 16× smaller and coarse, the
    * e24 recall distribution made visible at the vector level). Per-
    * ITEM rows, no float mean anywhere (the c41 rule); each codec
    * costs one encode pass plus the original-side join. PQ decode is
    * code → centroid subvector lookups against the literal codebook,
    * flattened in subspace order — exactly the inverse of
    * [[pqEncodeCarrying]]'s argmin.
    */
  def quantErrorReport(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    def refOf(src: DataFrame) = withNorm(src)
      .select(col("vec_id"), col("embedding").as("o_emb"), col("nrm").as("o_nrm"))
    val o = refOf(embeddings)
    // the recon is MATERIALIZED before withNorm's zero-norm filter: a
    // .filter on a derived column predicate-pushes below the recon
    // projections and re-evaluates the WHOLE encode+decode chain per
    // row in an interpreted Filter (the §6b round-4 trap — measured
    // here as two 1.4 MB filter predicates carrying the full inlined
    // argmin tree). The barrier is also the honest harness shape: an
    // evaluation pass materializes its reconstructions once, then
    // grades them.
    def cosOf(recon: DataFrame, codec: String, ref: DataFrame = o) =
      withNorm(Stage.checkpointFresh(recon))
        .select(col("vec_id"), col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
        .join(ref, Seq("vec_id"))
        .select(lit(codec).as("codec"), col("vec_id"),
          (dot(col("o_emb"), col("r_emb")) / (col("o_nrm") * col("r_nrm")))
            .as("recon_cos"))
    val sq8 = cosOf(dequantizeSq8(quantizeSq8(embeddings)), "sq8")
    // the 8 code lookups are TOP-LEVEL expressions in one projection,
    // never a lambda over `codes`: a transform-lambda references the
    // codes alias once, so CollapseProject inlines the ENTIRE encode
    // argmin into the lambda body and re-evaluates it per subspace —
    // measured 8× the whole-op cost (26 s vs 3 s at sf0.1) before this
    // rewrite. The round-4 §6b rule, now with a lambda as the
    // single-reference consumer.
    def pqReconOf(src: DataFrame) = {
      val cents = pqCentroidTable(withNorm(src), dim)
      // PER-SUBSPACE codebook literals: one shared full-codebook
      // literal referenced from all 8 concat arms puts 8 copies of the
      // whole 8x16x8 table into the serialized plan (each Literal
      // occurrence carries its own value) — with three report branches
      // that printed a 3 MB plan. Each arm only ever indexes its own
      // subspace, so it carries just that 16x8 subtable.
      val subLits = cents.map(s => typedLit(s.map(_.map(_.toFloat).toSeq).toSeq))
      quantizePqWith(src, cents)
        .select(col("vec_id"),
          concat((0 until pqSubspaces).map { s =>
            element_at(subLits(s), element_at(col("codes"), s + 1) + 1)
          }: _*).as("embedding"))
    }
    // E26 comparison row (round 10): the pq_opq codec quantizes the
    // ROTATED corpus and measures recon error in the rotated space —
    // directly comparable to 'pq' because the rotation is orthogonal
    // (true cosines are preserved; only quantization differs)
    val rot = opqRotate(embeddings, dim)
    sq8.unionByName(cosOf(pqReconOf(embeddings), "pq"))
      .unionByName(cosOf(pqReconOf(rot), "pq_opq", refOf(rot)))
  }

  /** E18: hybrid retrieval by reciprocal-rank fusion — the production
    * RAG serving shape: a dense list (E1 cosine over the embedding) and
    * a sparse list (F12 BM25 over the text) fuse by
    * Σ 1/(kRrf + rank) with absent-from-a-list contributing 0 — RRF
    * (Cormack/Clarke/Buettcher, SIGIR'09) needs no score calibration
    * between the two systems because only RANKS enter the fusion.
    *
    * The corpus cost is the two retrievals (each already its own
    * bounded-plan operator); the fusion itself runs on nDense+nSparse
    * rows — the two rank windows and the full-outer join are over
    * post-limit lists (e10's bounded-pool class; the unpartitioned
    * window is ≤20 rows by construction). Portability: ranks are exact
    * integers from (score desc, id) orderings both engines resolve
    * identically (the e1/f12 scores are hash-matched), and each fused
    * score is two IEEE divisions added in a spelled order.
    */
  def hybridRrf(embeddings: DataFrame, docs: DataFrame, queryVecId: Long,
                queryTerms: Seq[String], nDense: Int = 20, nSparse: Int = 10,
                kRrf: Int = 60, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = cosineTopK(embeddings, queryVecId, nDense)
      .select(col("vec_id").as("doc_id"), col("score").as("cos_score"))
    val dRank = dense
      .withColumn("cos_rank", row_number()
        .over(Window.orderBy(col("cos_score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("cos_rank"))
    val sparse = TextAnalysis.bm25(docs, queryTerms, nSparse)
      .select(col("doc_id"), col("score").as("bm_score"))
    val sRank = sparse
      .withColumn("bm25_rank", row_number()
        .over(Window.orderBy(col("bm_score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
    sRank.join(dRank, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("cos_rank")), lit(0.0)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  /** E20: source-capped exact top-k — the "site collapse" serving
    * feature: at most `perSource` results from any one source, so a
    * near-dup-heavy domain can't monopolize the results page (the
    * constraint-based diversity dual of E10's score-based MMR: a hard
    * per-group cap instead of a similarity penalty). Results are the
    * true global top-k of the per-source-capped pool.
    *
    * Plan: one scored corpus pass (e1's broadcast-query scan), the
    * metadata join on the shared id space, then `row_number ≤ cap`
    * compiles to WindowGroupLimit — each partition prunes to its local
    * per-source head BEFORE the |sources|-keyed exchange (e13's class;
    * the wire carries ≤ cap × |sources| × partitions rows) — and the
    * close is TakeOrderedAndProject. At 100 TB the metadata join is
    * the co-location question: vector stores keep source beside the
    * vector (same table or an A12 bucketed layout on the id), making
    * the join a zipped read, never a second shuffle of the corpus.
    * Portability: ranks are integers over (score desc, vec_id) — both
    * engines resolve ties identically on the hash-matched e1 scores.
    */
  def cappedTopK(embeddings: DataFrame, meta: DataFrame, queryVecId: Long,
                 k: Int = 10, perSource: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
          .as("score"))
    val src = meta.select(col("doc_id").as("vec_id"), col("source"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.join(src, Seq("vec_id"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= perSource)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** E19: embedding-space drift — the vector-corpus twin of the c23/f21
    * drift monitors: per DIMENSION, the centroid (mean component) of a
    * reference slice vs an incoming slice and the absolute shift. A
    * retrained or re-normalized encoder moves centroids dimension-wise
    * long before nearest-neighbor quality visibly degrades — this is
    * the cheap early-warning pass over an embedding pipeline.
    *
    * Portability is the §6b fixed-point recipe extended to floats:
    * each component quantizes row-locally as floor(x · 2^20) (the 2^20
    * scale is a power of two, so the double multiply is EXACT and the
    * floor engine-identical), the per-(dim, slice) sums are then
    * order-independent INTEGER sums — safe through any shuffle — and
    * the mean divides back out in double once at the close. One corpus
    * pass, one |dims|-key aggregate (64 cells); at 100 TB the explode
    * carries (dim, long) pairs and the aggregate is map-side combined.
    */
  def embeddingDrift(embeddings: DataFrame): DataFrame =
    driftClose(quantizedComponents(embeddings)
      .groupBy(col("dim")).agg(driftSumExprs.head, driftSumExprs.tail: _*))

  /** E19's quantize stage as a shared projection (the H13
    * shared-arithmetic rule): the batch drift and the H26 streaming
    * monitor both consume exactly this — one definition, zero parity
    * surface. Every output is integral, so everything downstream is
    * commutative integer adds.
    */
  private[graft] def quantizedComponents(embeddings: DataFrame): DataFrame =
    embeddings
      .select((col("vec_id") % 2 === 0).as("is_ref"),
        posexplode(col("embedding")).as(Seq("d0", "x")))
      .select(col("is_ref"), (col("d0") + 1).as("dim"),
        floor(col("x").cast("double") * lit(1048576.0)).cast("long").as("qx"))

  /** The four per-dim sums — shared by the batch groupBy and the H26
    * streaming aggregation (where the state store carries exactly
    * these four longs + the count pair per dim).
    */
  private[graft] def driftSumExprs: Seq[Column] = Seq(
    sum(when(col("is_ref"), col("qx"))).as("sref"),
    count(when(col("is_ref"), lit(1))).as("nref"),
    sum(when(!col("is_ref"), col("qx"))).as("sinc"),
    count(when(!col("is_ref"), lit(1))).as("ninc"))

  /** The close: sums → means → drift, in the one spelled double-op
    * order the oracle mirrors.
    */
  private[graft] def driftClose(sums: DataFrame): DataFrame =
    sums.select(col("dim").cast("long").as("dim"),
      (col("sref").cast("double") / col("nref") / lit(1048576.0)).as("mean_ref"),
      (col("sinc").cast("double") / col("ninc") / lit(1048576.0)).as("mean_inc"),
      abs(col("sref").cast("double") / col("nref") / lit(1048576.0) -
        col("sinc").cast("double") / col("ninc") / lit(1048576.0)).as("drift"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // E14: recall@20 of the LSH and IVF indexes vs the exact truth set.
    "e14_ann_recall" -> ((s, d) => annRecall(t(s, d, "embeddings"))),

    // E18: RRF fusion of the e1 dense list (query vec 0) and the f12
    // sparse list (the shared bm25QueryTerms) — doc_id and vec_id are
    // the same id space (e9's join convention).
    "e18_hybrid_rrf" -> ((s, d) => hybridRrf(t(s, d, "embeddings"),
      t(s, d, "documents"), 0L, TextAnalysis.bm25QueryTerms)),

    // E19: per-dimension centroid drift, even vec_ids as the reference
    // slice vs odd as incoming (f21's parity-split convention).
    "e19_embedding_drift" -> ((s, d) => embeddingDrift(t(s, d, "embeddings"))),

    // E20: exact top-10 with at most 2 results per source (the site-
    // collapse cap; constraint dual of e10's MMR).
    "e20_capped_topk" -> ((s, d) => cappedTopK(t(s, d, "embeddings"),
      t(s, d, "documents"), 0L)),

    // E10: MMR diversified re-rank of the e1 pool (driver greedy over a
    // BOUNDED candidate list; oracle is a recursive CTE replaying the
    // identical greedy).
    "e10_mmr_topk" -> ((s, d) => mmrDiversify(t(s, d, "embeddings"), 0L, 20, 10)),

    // E8: PQ codes + ADC search — oracle hash-matched (seeded centroids,
    // deterministic argmin encode, table-lookup scoring).
    "e8_ann_pq" -> ((s, d) => pqTopK(t(s, d, "embeddings"), 0L, 20)),

    // E8b: PQ with k-means-learned codebooks (rows-only: k-means init
    // is engine-private; the spec asserts the learned codebook beats
    // the seeded one on quantization error).
    // E8 learned: the portable per-subspace Lloyd fit (oracle-checked
    // since round 12; MLlib k-means stays as pqTopKLearned, spec'd).
    "e8_ann_pq_kmeans" -> ((s, d) => pqTopKLloyd(t(s, d, "embeddings"), 0L, 20)),

    // E21: ADC shortlist (e8's top-20) → exact rescore → exact top-10.
    "e21_pq_refine" -> ((s, d) => pqRefineTopK(t(s, d, "embeddings"), 0L, 10)),

    // E7: SQ8-compressed-corpus ANN top-20 (rows-only; reconstruction
    // bound + recall vs E1 in the spec).
    "e7_ann_sq8" -> ((s, d) => sq8TopK(t(s, d, "embeddings"), 0L, 20)),

    // E11: all vectors within cosine ≥ 0.2 of query 0 — range-search
    // dual of e1; no top-k merge stage, pure scan+filter.
    "e11_radius_search" -> ((s, d) =>
      radiusSearch(t(s, d, "embeddings"), 0L, 0.2)),

    // E12: SQ8-candidates → exact rerank — the two-stage serving form;
    // exact scores out, compressed scan in.
    "e12_sq8_rerank" -> ((s, d) => sq8Rerank(t(s, d, "embeddings"), 0L, 50, 10)),

    // E13: top-5 per label for query 0 — class-conditioned retrieval in
    // one scan (WindowGroupLimit prunes per partition).
    "e13_knn_per_label" -> ((s, d) => knnPerLabel(t(s, d, "embeddings"), 0L, 5)),
    // E5: batch kNN join — top-10 neighbors for query vectors 0..7.
    "e5_knn_join" -> ((s, d) => knnJoin(t(s, d, "embeddings"), 0L until 8L, 10)),
    // E1: exact brute-force cosine top-20 for query vector 0.
    "e1_cosine_topk" -> ((s, d) => cosineTopK(t(s, d, "embeddings"), 0L, 20)),

    // E9: PRE-filtered vector search — the metadata predicate restricts
    // the candidate set BEFORE ranking (post-filtering a top-k can
    // return < k and re-ranks a biased pool; real vector stores treat
    // filtered search as its own operator). Composition: the predicate
    // scans the metadata table with pushdown, semi-joins the corpus on
    // the id, then the usual broadcast-query scoring + global top-k.
    // At 100 TB metadata lives beside the vectors (same table or
    // bucketed on the id) so the semi join is co-located or a runtime
    // bloom prefilter (b34 pattern); the IVF composition additionally
    // prunes probe cells first.
    "e9_filtered_topk" -> ((s, d) => {
      val docs = t(s, d, "documents")
      filteredCosineTopK(t(s, d, "embeddings"), docs,
        col("lang") === "en", 0L, 20)
    }),

    // E2: LSH-bucketed ANN top-20 — oracle hash-matched (md5-portable
    // buckets); recall vs E1 still measured in the spec.
    "e2_ann_lsh" -> ((s, d) => annTopK(t(s, d, "embeddings"), 0L, 20)),

    // E2b: IVF-style centroid-routed ANN top-20 (rows-only).
    "e3_ann_ivf" -> ((s, d) => ivfTopK(t(s, d, "embeddings"), 0L, 20)),

    // E15: IVF-PQ — cell-routed candidates, PQ/ADC scoring; the e3×e8
    // composition, oracle hash-matched (both halves are deterministic).
    "e15_ann_ivfpq" -> ((s, d) => ivfPqTopK(t(s, d, "embeddings"), 0L, 20)),

    // E17: batch IVF-PQ kNN join — e5's query batch (0..7, k=10)
    // through the routed/coded serve path.
    "e17_ann_ivfpq_join" -> ((s, d) =>
      ivfPqKnnJoin(t(s, d, "embeddings"), 0L until 8L, 10)),

    // E17 at the production batch: 256 queries — past the literal
    // threshold, so the broadcast-model path serves (round-10: now an
    // oracled query so the cross-sf scaling audit covers it).
    "e17_join_q256" -> ((s, d) =>
      ivfPqKnnJoin(t(s, d, "embeddings"), 0L until 256L, 10)),

    // E4: IVF with LEARNED centroids — the portable fixed-seed Lloyd
    // fit (oracle-checked since round 12; MLlib k-means‖ remains the
    // sampled-init alternative, spec-covered + bench-priced).
    "e4_ann_ivf_kmeans" -> ((s, d) => ivfTopKLloyd(t(s, d, "embeddings"), 0L, 20)),

    // E23: the IVF probe-count planner sweep (recall@20 vs nprobe).
    "e23_ivf_probe_sweep" -> ((s, d) => ivfProbeSweep(t(s, d, "embeddings"))),

    // E24: per-query recall of the batch IVF-PQ join vs exact batch kNN.
    "e24_batch_recall" -> ((s, d) => batchRecall(t(s, d, "embeddings"))),

    // E25: per-vector SQ8/PQ/OPQ reconstruction cosine — the codec
    // decider (pq_opq added round 10: rotated-space recon error).
    "e25_quant_error" -> ((s, d) => quantErrorReport(t(s, d, "embeddings"))),

    // E26: seeded-PQ search over the fixed md5-seeded rotation.
    "e26_ann_opq" -> ((s, d) => opqPqTopK(t(s, d, "embeddings"), 0L, 20)),

    // E26b: recall@20 of rotated vs unrotated PQ against exact cosine.
    "e26_opq_recall" -> ((s, d) => opqRecallReport(t(s, d, "embeddings")))
  )

  def oracles: Map[String, String] = {
    val base = baseOracles
    // E14/E18 compose the retrieval oracles verbatim (each keeps its
    // own WITH scope inside a derived table), so the fusion/recall
    // oracles can never drift from the lists they grade.
    base + ("e26_opq_recall" ->
      // E26b composes the e1/e8/e26 oracles verbatim (the e24 shape):
      // recall@20 of each PQ variant against the exact list, one row
      // per codec.
      s"""WITH exact AS (SELECT vec_id FROM (${base("e1_cosine_topk")})),
         |pq AS (SELECT vec_id FROM (${base("e8_ann_pq")})),
         |opq AS (SELECT vec_id FROM (${base("e26_ann_opq")}))
         |SELECT 'pq' AS codec, CAST(20 AS BIGINT) AS k,
         |       CAST(count(*) AS BIGINT) AS n_hit,
         |       CAST(count(*) AS DOUBLE) / CAST(20 AS DOUBLE) AS recall
         |FROM pq JOIN exact USING (vec_id)
         |UNION ALL
         |SELECT 'pq_opq' AS codec, CAST(20 AS BIGINT) AS k,
         |       CAST(count(*) AS BIGINT) AS n_hit,
         |       CAST(count(*) AS DOUBLE) / CAST(20 AS DOUBLE) AS recall
         |FROM opq JOIN exact USING (vec_id)""".stripMargin) +
      ("e18_hybrid_rrf" ->
      s"""WITH d AS (
         |  SELECT vec_id AS doc_id,
         |         row_number() OVER (ORDER BY score DESC, vec_id) AS cos_rank
         |  FROM (${base("e1_cosine_topk")})),
         |s AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
         |  FROM (${TextAnalysis.oracles("f12_bm25_search")}))
         |SELECT coalesce(s.doc_id, d.doc_id) AS doc_id, s.bm25_rank, d.cos_rank,
         |       coalesce(CAST(1.0 AS DOUBLE) / (60 + s.bm25_rank), CAST(0.0 AS DOUBLE))
         |     + coalesce(CAST(1.0 AS DOUBLE) / (60 + d.cos_rank), CAST(0.0 AS DOUBLE))
         |         AS rrf_score
         |FROM s FULL OUTER JOIN d ON s.doc_id = d.doc_id
         |ORDER BY rrf_score DESC, doc_id
         |LIMIT 10""".stripMargin) +
      // E21 composes the FULL e8 chain verbatim as its shortlist CTE —
      // the refine oracle can never drift from the ADC ranking it
      // refines — then rescoring is e1's exact-cosine arithmetic on
      // the 20 shortlisted ids.
      ("e21_pq_refine" ->
      s"""WITH short AS (SELECT vec_id FROM (${base("e8_ann_pq")})),
         |e AS (
         |  SELECT vec_id, embedding,
         |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, len(embedding) + 1),
         |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
         |           (x, y) -> x + y)) AS nrm
         |  FROM embeddings
         |  WHERE nrm > 0),
         |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |         list_transform(range(1, len(e.embedding) + 1),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
         |         (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
         |FROM e JOIN short USING (vec_id), q
         |ORDER BY score DESC, e.vec_id
         |LIMIT 10""".stripMargin) +
      ("e14_ann_recall" ->
      s"""WITH exact AS (SELECT vec_id FROM (${base("e1_cosine_topk")})),
         |lsh AS (SELECT vec_id FROM (${base("e2_ann_lsh")})),
         |ivf AS (SELECT vec_id FROM (${base("e3_ann_ivf")})),
         |m AS (
         |  SELECT 'lsh' AS method, count(*) AS n_hit FROM lsh
         |    WHERE vec_id IN (SELECT vec_id FROM exact)
         |  UNION ALL
         |  SELECT 'ivf' AS method, count(*) AS n_hit FROM ivf
         |    WHERE vec_id IN (SELECT vec_id FROM exact))
         |SELECT method, CAST(20 AS BIGINT) AS k, n_hit,
         |       CAST(n_hit AS DOUBLE) / 20 AS recall
         |FROM m""".stripMargin) +
      // E23 composes ivfOracleSql at each probe count — the sweep
      // grades the exact retrievals e3 serves, never a re-derivation.
      ("e23_ivf_probe_sweep" -> {
        val ps = Seq(1, 2, 4, 8, 16)
        s"""WITH exact AS (SELECT vec_id FROM (${base("e1_cosine_topk")})),
           |${ps.map(p => s"p$p AS (SELECT vec_id FROM (${ivfOracleSql(p)}))").mkString(",\n")},
           |m AS (
           |${ps.map(p =>
              s"  SELECT CAST($p AS BIGINT) AS n_probes, count(*) AS n_hit FROM p$p WHERE vec_id IN (SELECT vec_id FROM exact)")
              .mkString("\n  UNION ALL\n")})
           |SELECT n_probes, CAST(20 AS BIGINT) AS k, n_hit,
           |       CAST(n_hit AS DOUBLE) / 20 AS recall
           |FROM m""".stripMargin
      }) +
      // E24 composes the e5 + e17 batch oracles verbatim; the LEFT
      // join keeps zero-hit queries at recall 0 instead of dropping.
      // The query list is the SAME driver-known literal 0..7 the engine
      // uses — re-deriving it from `exact` would drop a query absent
      // from the corpus where the engine honestly reports recall 0.
      ("e24_batch_recall" ->
      s"""WITH exact AS (SELECT q_id, vec_id FROM (${base("e5_knn_join")})),
         |ann AS (SELECT q_id, vec_id FROM (${base("e17_ann_ivfpq_join")})),
         |h AS (
         |  SELECT a.q_id, count(*) AS h
         |  FROM ann a JOIN exact e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
         |  GROUP BY 1)
         |SELECT q.q_id, CAST(10 AS BIGINT) AS k,
         |       CAST(coalesce(h.h, 0) AS BIGINT) AS n_hit,
         |       CAST(coalesce(h.h, 0) AS DOUBLE) / 10 AS recall
         |FROM (SELECT CAST(r AS BIGINT) AS q_id FROM range(0, 8) t(r)) q
         |LEFT JOIN h USING (q_id)""".stripMargin)
  }

  /** E3/E23 shared oracle generator: the IVF retrieval SQL with the
    * probe count as the one parameter (`rn <= nProbes`) — the sweep
    * grades exactly the retrieval e3 serves.
    */
  /** Scores of each DOUBLE-component centroid (a Lloyd mean) against
    * the row's float vector — [[centScores]]' mixed-width sibling, on
    * the native [[graft.functions.FloatDoubleVecDot]] fold.
    */
  private[graft] def centScoresD(cents: Array[(Array[Double], Double)],
                                 embCol: Column, nrmCol: Column): Column = array(
    cents.toIndexedSeq.map { case (cv, cn) =>
      graft.functions.VectorFunctions.vecDotD(embCol, typedLit(cv.toSeq)) /
        (nrmCol * lit(cn))
    }: _*)

  /** L2 norm of a double centroid, as the SAME left-to-right IEEE fold
    * the DuckDB oracle's `list_reduce(list_transform(c, x -> x*x))`
    * runs — driver-side Scala, but bit-identical by op sequence.
    */
  private def centNormD(cv: Array[Double]): Double =
    math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))

  /** E4 fit, the PORTABLE form — fixed-seed, fixed-iteration Lloyd
    * k-means in exact arithmetic, the round-8 principle ("approximate
    * ops have exact parameter points") applied to learned clustering:
    *
    *  - init = the e3 seeding (first `nCentroids` corpus vectors by
    *    vec_id — deterministic, engine-portable);
    *  - assignment = cosine argmax against the current centroids, ties
    *    to the lowest centroid id (the proven e3 argmax pattern);
    *  - update = per-cell per-dimension MEAN computed through a
    *    floor-quantized INTEGER sum: q = floor(x·10⁹) per component
    *    (floor is the §6b-portable double→int path), Σq is an exact,
    *    order-independent BIGINT — so the shuffle layout cannot change
    *    the result — and the mean is ONE double division
    *    `Σq / (n · 10⁹)` whose operands are exact; an empty cell keeps
    *    its previous centroid.
    *
    * Every float→double widening, fold order, tie rule and the single
    * rounding point are mirrored verbatim in [[lloydOracleSql]], which
    * is why this fit — unlike MLlib's k-means‖ ([[fitIvfKmeans]], whose
    * init samples an RNG — hash-matches a DuckDB oracle. Driver state
    * is the centroid model only (k·d doubles per iteration), collected
    * from a 16×d-row aggregate; the corpus-side work per iteration is
    * one argmax projection + one map-side-combined integer aggregate —
    * at 100 TB that is `iters` linear passes, the textbook distributed
    * Lloyd shape.
    */
  def lloydCentroids(embeddings: DataFrame, nCentroids: Int = 16,
                     iters: Int = 2): Array[(Array[Double], Double)] = {
    val e = withNorm(embeddings)
    var cents: Array[Array[Double]] = e.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.nonEmpty, "corpus has no non-zero vectors to seed centroids")
    for (_ <- 1 to iters) {
      val withCents = cents.map(c => (c, centNormD(c)))
      val agg = e
        .withColumn("cell", cellOfD(withCents, col("embedding"), col("nrm")))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("i"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * lit(1.0e9))).as("sq"))
        .collect()
      val byCell = agg.groupBy(_.getAs[Int]("cell"))
      cents = cents.zipWithIndex.map { case (old, cid) =>
        byCell.get(cid) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("i")).map { r =>
              r.getAs[Long]("sq").toDouble /
                (r.getAs[Long]("n").toDouble * 1.0e9)
            }
          case None => old // empty cell: centroid carries over
        }
      }
    }
    cents.map(c => (c, centNormD(c)))
  }

  /** The query's nProbes closest LEARNED cells — [[probeCellsFor]] over
    * double centroids, explicit left fold (mirrors the oracle's probes
    * CTE op-for-op).
    */
  private[graft] def probeCellsForD(cents: Array[(Array[Double], Double)],
                                    qVec: Array[Float], qNrm: Double,
                                    nProbes: Int): Seq[Int] =
    cents.zipWithIndex.map { case ((cv, cn), i) =>
      val num = qVec.zip(cv).foldLeft(0.0) { case (a, (q, c)) =>
        a + q.toDouble * c
      }
      (i, num / (cn * qNrm))
    }.sortBy { case (i, d) => (-d, i) }.take(nProbes).map(_._1).toSeq

  /** E4, the oracle-checked form: IVF whose centroids are LEARNED by
    * [[lloydCentroids]] — same probe interface and exact-cosine close
    * as [[ivfTopK]], but the cells come from real (deterministic,
    * portable) training instead of raw seeds. [[ivfTopKLearned]] keeps
    * the MLlib k-means‖ fit for corpora where sampled init matters;
    * SimilaritySpec records the recall parity between the two.
    */
  def ivfTopKLloyd(embeddings: DataFrame, queryVecId: Long, k: Int,
                   nCentroids: Int = 16, nProbes: Int = 2,
                   iters: Int = 2): DataFrame = {
    val e = withNorm(embeddings)
    val cents = lloydCentroids(embeddings, nCentroids, iters)
    val qRows = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).take(1)
    if (qRows.isEmpty) {
      return e.select(col("vec_id"), lit(0).as("cell"), lit(0.0).as("score")).limit(0)
    }
    val qVec = qRows(0).getSeq[Float](0).toArray
    val qNrm = qRows(0).getDouble(1)
    val probeCells = probeCellsForD(cents, qVec, qNrm, nProbes)
    e.filter(col("vec_id") =!= queryVecId)
      .withColumn("cell", cellOfD(cents, col("embedding"), col("nrm")))
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell"),
        (dot(col("embedding"), typedLit(qVec.toSeq)) / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  private def ivfOracleSql(nProbes: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
       |           (x, y) -> x + y)) AS nrm
       |  FROM embeddings
       |  WHERE nrm > 0),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding, nrm
       |  FROM e ORDER BY vec_id LIMIT 16),
       |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
       |cscore AS (
       |  SELECT e.vec_id, c.cent_id,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, len(e.embedding) + 1),
       |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
       |           (x, y) -> x + y) / (e.nrm * c.nrm) AS s
       |  FROM e, cents c
       |  WHERE e.vec_id <> 0),
       |cellof AS (
       |  SELECT vec_id, CAST(cent_id AS INTEGER) AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
       |    FROM cscore) WHERE rn = 1),
       |probes AS (
       |  SELECT cent_id FROM (
       |    SELECT c.cent_id,
       |           row_number() OVER (ORDER BY
       |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |               list_transform(range(1, len(c.embedding) + 1),
       |                 i -> CAST(c.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
       |               (x, y) -> x + y) / (c.nrm * qv.q_nrm) DESC, c.cent_id) AS rn
       |    FROM cents c, qv) WHERE rn <= $nProbes)
       |SELECT e.vec_id, co.cell,
       |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list_transform(range(1, len(e.embedding) + 1),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
       |         (x, y) -> x + y) / (e.nrm * qv.q_nrm) AS score
       |FROM e, cellof co, qv
       |WHERE e.vec_id = co.vec_id
       |  AND co.cell IN (SELECT cent_id FROM probes)
       |ORDER BY score DESC, e.vec_id
       |LIMIT 20""".stripMargin

  /** E4 oracle generator — [[lloydCentroids]]/[[ivfTopKLloyd]] mirrored
    * op-for-op in DuckDB SQL, iterations UNROLLED (the count is a fixed
    * parameter, so no recursive CTE is needed). The portability
    * load-bearers, each §6b-proven elsewhere: float→double widening
    * inside the fold; one left-to-right `list_reduce` per dot/norm;
    * argmax ties to the lowest centroid id via `row_number`; the
    * centroid mean through floor-quantized BIGINT sums (`CAST(SUM
    * AS BIGINT)` collapses DuckDB's HUGEINT) and ONE double division;
    * empty cells carry the previous centroid via LEFT JOIN + CASE.
    * ONE generator emits every iteration's CTEs, so the per-iteration
    * arithmetic cannot drift between positions (the round-8
    * shared-generator rule).
    */
  private def lloydOracleSql(nCentroids: Int, iters: Int, nProbes: Int,
                             k: Int): String = {
    def foldFD(emb: String, cemb: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, len($emb) + 1),
         |             i -> CAST($emb[i] AS DOUBLE) * $cemb[i])),
         |           (x, y) -> x + y)""".stripMargin
    def cnrm(cemb: String) =
      s"""sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform($cemb, x -> x * x)), (x, y) -> x + y))""".stripMargin
    val iterCtes = (1 to iters).map { j =>
      s"""s$j AS (
         |  SELECT e.vec_id, c.cent_id,
         |         ${foldFD("e.embedding", "c.cemb")}
         |           / (e.nrm * ${cnrm("c.cemb")}) AS s
         |  FROM e, c${j - 1} c),
         |l$j AS (
         |  SELECT vec_id, CAST(cent_id AS INTEGER) AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
         |    FROM s$j) WHERE rn = 1),
         |a$j AS (
         |  SELECT cell, i, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq FROM (
         |    SELECT l.cell,
         |           UNNEST(range(1, len(e.embedding) + 1)) AS i,
         |           UNNEST(list_transform(e.embedding,
         |             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT))) AS q
         |    FROM e JOIN l$j l ON e.vec_id = l.vec_id)
         |  GROUP BY cell, i),
         |c$j AS (
         |  SELECT p.cent_id,
         |         CASE WHEN m.cemb IS NULL THEN p.cemb ELSE m.cemb END AS cemb
         |  FROM c${j - 1} p LEFT JOIN (
         |    SELECT cell AS cent_id,
         |           list(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
         |                ORDER BY i) AS cemb
         |    FROM a$j GROUP BY cell) m ON p.cent_id = m.cent_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
       |           (x, y) -> x + y)) AS nrm
       |  FROM embeddings
       |  WHERE nrm > 0),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       |  FROM e ORDER BY vec_id LIMIT $nCentroids),
       |$iterCtes,
       |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
       |fs AS (
       |  SELECT e.vec_id, c.cent_id,
       |         ${foldFD("e.embedding", "c.cemb")}
       |           / (e.nrm * ${cnrm("c.cemb")}) AS s
       |  FROM e, c$iters c
       |  WHERE e.vec_id <> 0),
       |fl AS (
       |  SELECT vec_id, CAST(cent_id AS INTEGER) AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
       |    FROM fs) WHERE rn = 1),
       |probes AS (
       |  SELECT cent_id FROM (
       |    SELECT c.cent_id,
       |           row_number() OVER (ORDER BY
       |             ${foldFD("qv.q_emb", "c.cemb")}
       |               / (${cnrm("c.cemb")} * qv.q_nrm) DESC, c.cent_id) AS rn
       |    FROM c$iters c, qv) WHERE rn <= $nProbes)
       |SELECT e.vec_id, fl.cell,
       |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list_transform(range(1, len(e.embedding) + 1),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
       |         (x, y) -> x + y) / (e.nrm * qv.q_nrm) AS score
       |FROM e JOIN fl ON e.vec_id = fl.vec_id, qv
       |WHERE fl.cell IN (SELECT cent_id FROM probes)
       |ORDER BY score DESC, e.vec_id
       |LIMIT $k""".stripMargin
  }

  /** E17 shared oracle generator: e15's CTE chain generalized over a
    * query batch — qs is multi-row, probes/dot tables group per qid
    * (nsq stays shared), codes compute once per corpus vector,
    * candidates are cellof ⋈ probes with per-pair self-exclusion, and
    * the close is e5's per-query QUALIFY row_number. The QUERY LIST is
    * the one parameter (the round-8 shared-generator rule): the 8-query
    * verify batch and the 256-query production batch — which exercises
    * the engine's broadcast-model path past ivfPqJoinLiteralLimit —
    * grade through the SAME SQL, so the two paths cannot diverge
    * oracle-side either.
    */
  private def e17JoinSql(qids: Seq[Long]): String =
    s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding, nrm
        |  FROM e ORDER BY vec_id LIMIT 16),
        |qs AS (
        |  SELECT vec_id AS qid, embedding AS q_emb, nrm AS q_nrm
        |  FROM e WHERE vec_id IN (${qids.mkString(", ")})),
        |cscore AS (
        |  SELECT e.vec_id, c.cent_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * c.nrm) AS s
        |  FROM e, cents c),
        |cellof AS (
        |  SELECT vec_id, CAST(cent_id AS INTEGER) AS cell FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
        |    FROM cscore) WHERE rn = 1),
        |probes AS (
        |  SELECT qid, cent_id FROM (
        |    SELECT q.qid, c.cent_id,
        |           row_number() OVER (PARTITION BY q.qid ORDER BY
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, len(c.embedding) + 1),
        |                 i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |               (x, y) -> x + y) / (c.nrm * q.q_nrm) DESC, c.cent_id) AS rn
        |    FROM cents c, qs q) WHERE rn <= 2),
        |cl AS (
        |  SELECT list(sc ORDER BY s) AS cents FROM (
        |    SELECT s, list(sv ORDER BY cent_id) AS sc FROM (
        |      SELECT sp.s AS s, c.cent_id AS cent_id,
        |             list_transform(range(1, 9),
        |               d -> CAST(c.embedding[sp.s * 8 + d] AS DOUBLE)) AS sv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cents c)
        |    GROUP BY s)),
        |ntab AS (
        |  SELECT list(nsqs ORDER BY s) AS nsq_tab FROM (
        |    SELECT s, list(nsqv ORDER BY cent_id) AS nsqs FROM (
        |      SELECT sp.s AS s, c.cent_id AS cent_id,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS nsqv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cents c)
        |    GROUP BY s)),
        |tabs AS (
        |  SELECT qid, list(dots ORDER BY s) AS dot_tab FROM (
        |    SELECT qid, s, list(dotv ORDER BY cent_id) AS dots FROM (
        |      SELECT q.qid AS qid, sp.s AS s, c.cent_id AS cent_id,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(q.q_emb[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS dotv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cents c, qs q)
        |    GROUP BY qid, s)
        |  GROUP BY qid),
        |codes AS (
        |  SELECT e2.vec_id,
        |         list_transform(range(0, 8), s ->
        |           list_position(
        |             list_transform(range(0, 16), c ->
        |               t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                   list_transform(range(1, 9), d ->
        |                     CAST(e2.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                   (x, y) -> x + y)),
        |             list_min(
        |               list_transform(range(0, 16), c ->
        |                 t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                     list_transform(range(1, 9), d ->
        |                       CAST(e2.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                     (x, y) -> x + y)))) - 1) AS codes
        |  FROM e e2, cl, ntab t),
        |cand AS (
        |  SELECT p.qid, co.vec_id, co.cell
        |  FROM cellof co JOIN probes p ON co.cell = p.cent_id
        |  WHERE co.vec_id <> p.qid),
        |adc AS (
        |  SELECT c.qid, c.vec_id, c.cell,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             t.dot_tab[s + 1][k.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_dot,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             n.nsq_tab[s + 1][k.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_nsq
        |  FROM cand c
        |  JOIN codes k ON c.vec_id = k.vec_id
        |  JOIN tabs t ON t.qid = c.qid, ntab n),
        |scored AS (
        |  SELECT a.qid AS q_id, a.vec_id, a.cell,
        |         a.adc_dot / (sqrt(a.adc_nsq) * q.q_nrm) AS score
        |  FROM adc a JOIN qs q ON q.qid = a.qid
        |  WHERE a.adc_nsq > 0)
        |SELECT q_id, vec_id, cell, score,
        |       CAST(row_number() OVER (PARTITION BY q_id
        |                               ORDER BY score DESC, vec_id) AS INT) AS rnk
        |FROM scored
        |QUALIFY rnk <= 10""".stripMargin

  /** E26 rotation CTE chain: the SAME reflection constants the engine
    * interpolates ([[opqU]] — one generator, both sides), each step
    * two CTEs (fold, update) mirroring the engine's two projections,
    * closed by the CAST AS REAL that makes the rotated corpus a
    * drop-in PQ source. Returns "r0 AS (...), ..., rot AS (...)".
    */
  private def opqRotCtes(src: String, dim: Int = 64): String = {
    val n1 = dim + 1
    val init =
      s"""r0 AS (
         |  SELECT vec_id, list_transform(range(1, $n1),
         |    d -> CAST(embedding[d] AS DOUBLE)) AS emb
         |  FROM $src)""".stripMargin
    val stages = (0 until opqReflections).map { i =>
      val u = opqU(i, dim)
      val uu = u.map(x => x.toLong * x).sum
      val ul = u.mkString("[", ", ", "]")
      s"""rs$i AS (
         |  SELECT vec_id, emb,
         |         CAST(2 AS DOUBLE) * list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, $n1),
         |           d -> emb[d] * CAST(($ul)[d] AS DOUBLE))), (x, y) -> x + y)
         |           / CAST($uu AS DOUBLE) AS coef
         |  FROM r$i),
         |r${i + 1} AS (
         |  SELECT vec_id, list_transform(range(1, $n1),
         |    d -> emb[d] - coef * CAST(($ul)[d] AS DOUBLE)) AS emb
         |  FROM rs$i)""".stripMargin
    }
    val close =
      s"""rot AS (
         |  SELECT vec_id, list_transform(range(1, $n1),
         |    d -> CAST(emb[d] AS REAL)) AS embedding
         |  FROM r$opqReflections)""".stripMargin
    (init +: stages :+ close).mkString(",\n")
  }

  /** E8/E26 shared oracle generator: the seeded-PQ/ADC search SQL with
    * the corpus relation as the parameter — e8 passes the raw
    * embeddings, e26 passes the rotated CTE (prepended via `pre`), so
    * the search arithmetic exists once for both codecs.
    */
  private def pqSearchSql(src: String, pre: String = ""): String =
    "WITH " + s"""${pre}e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM $src
        |  WHERE nrm > 0),
        |cseed AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
        |  FROM e ORDER BY vec_id LIMIT 16),
        |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |cl AS (
        |  SELECT list(sc ORDER BY s) AS cents FROM (
        |    SELECT s, list(sv ORDER BY cid) AS sc FROM (
        |      SELECT sp.s AS s, c.cid AS cid,
        |             list_transform(range(1, 9),
        |               d -> CAST(c.embedding[sp.s * 8 + d] AS DOUBLE)) AS sv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cseed c)
        |    GROUP BY s)),
        |tabs AS (
        |  SELECT list(dots ORDER BY s) AS dot_tab, list(nsqs ORDER BY s) AS nsq_tab FROM (
        |    SELECT s, list(dotv ORDER BY cid) AS dots, list(nsqv ORDER BY cid) AS nsqs FROM (
        |      SELECT sp.s AS s, c.cid AS cid,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(q.q_emb[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS dotv,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS nsqv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cseed c, qv q)
        |    GROUP BY s)),
        |codes AS (
        |  SELECT emb.vec_id,
        |         list_transform(range(0, 8), s ->
        |           list_position(
        |             list_transform(range(0, 16), c ->
        |               t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                   list_transform(range(1, 9), d ->
        |                     CAST(emb.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                   (x, y) -> x + y)),
        |             list_min(
        |               list_transform(range(0, 16), c ->
        |                 t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                     list_transform(range(1, 9), d ->
        |                       CAST(emb.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                     (x, y) -> x + y)))) - 1) AS codes
        |  FROM $src emb, cl, tabs t),
        |adc AS (
        |  SELECT co.vec_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             t.dot_tab[s + 1][co.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_dot,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             t.nsq_tab[s + 1][co.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_nsq
        |  FROM codes co, tabs t
        |  WHERE co.vec_id <> 0)
        |SELECT a.vec_id, a.adc_dot / (sqrt(a.adc_nsq) * qv.q_nrm) AS score
        |FROM adc a, qv
        |WHERE a.adc_nsq > 0
        |ORDER BY score DESC, a.vec_id
        |LIMIT 20""".stripMargin

  /** E8-learned oracle generator — [[fitPqLloyd]]/[[pqTopKLloyd]]
    * mirrored op-for-op, iterations unrolled (the e4 `lloydOracleSql`
    * pattern per subspace). The learned-book-specific parity points on
    * top of the seeded tail: the ENCODE dot float-rounds the centroid
    * element (`CAST(cemb AS REAL)` ↔ the engine's `.toFloat` for the
    * native dot — a no-op in generation 0 where the book is data
    * floats) while the nsq/ADC tables stay double; centroid means go
    * through floor-quantized BIGINT sums and one double division;
    * empty (subspace, code) cells carry the previous centroid.
    */
  private def lloydPqSql(src: String, iters: Int): String = {
    // dist(s, c) of row `emb` against book relation alias `b` — the
    // encode argmin body, shared by every iteration and the final codes
    def dist(bAlias: String, sExpr: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform($bAlias.cents[$sExpr + 1][c + 1], x -> x * x)),
         |  (x, y) -> x + y)
         |- 2.0 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, 9), d ->
         |    CAST(emb.embedding[$sExpr * 8 + d] AS DOUBLE) *
         |    CAST(CAST($bAlias.cents[$sExpr + 1][c + 1][d] AS REAL) AS DOUBLE))),
         |  (x, y) -> x + y)""".stripMargin
    val iterCtes = (1 to iters).map { j =>
      s"""cd$j AS (
         |  SELECT emb.vec_id, sp.s AS s,
         |         CAST(list_position(
         |           list_transform(range(0, 16), c -> ${dist(s"bk${j - 1}", "sp.s")}),
         |           list_min(list_transform(range(0, 16), c -> ${dist(s"bk${j - 1}", "sp.s")})))
         |           - 1 AS INTEGER) AS cell
         |  FROM e emb, bk${j - 1}, (SELECT unnest(range(0, 8)) AS s) sp),
         |ag$j AS (
         |  SELECT s, cell, d, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq FROM (
         |    SELECT c.s, c.cell,
         |           UNNEST(range(1, 9)) AS d,
         |           UNNEST(list_transform(range(1, 9), d2 ->
         |             CAST(floor(CAST(e.embedding[c.s * 8 + d2] AS DOUBLE)
         |                        * 1000000000.0) AS BIGINT))) AS q
         |    FROM e JOIN cd$j c ON e.vec_id = c.vec_id)
         |  GROUP BY s, cell, d),
         |bk$j AS (
         |  SELECT list(sc ORDER BY s) AS cents FROM (
         |    SELECT s, list(cv ORDER BY c) AS sc FROM (
         |      SELECT g.s AS s, g.c AS c,
         |             coalesce(m.cemb, b.cents[g.s + 1][g.c + 1]) AS cv
         |      FROM (SELECT sp.s AS s, ci.c AS c
         |            FROM (SELECT unnest(range(0, 8)) AS s) sp,
         |                 (SELECT unnest(range(0, 16)) AS c) ci) g
         |      CROSS JOIN bk${j - 1} b
         |      LEFT JOIN (
         |        SELECT s, cell,
         |               list(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
         |                    ORDER BY d) AS cemb
         |        FROM ag$j GROUP BY s, cell) m
         |        ON m.s = g.s AND m.cell = g.c)
         |    GROUP BY s))""".stripMargin
    }.mkString(",\n")
    val bkF = s"bk$iters"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
       |           (x, y) -> x + y)) AS nrm
       |  FROM $src
       |  WHERE nrm > 0),
       |cseed AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
       |  FROM e ORDER BY vec_id LIMIT 16),
       |bk0 AS (
       |  SELECT list(sc ORDER BY s) AS cents FROM (
       |    SELECT s, list(sv ORDER BY cid) AS sc FROM (
       |      SELECT sp.s AS s, c.cid AS cid,
       |             list_transform(range(1, 9),
       |               d -> CAST(c.embedding[sp.s * 8 + d] AS DOUBLE)) AS sv
       |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cseed c)
       |    GROUP BY s)),
       |$iterCtes,
       |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
       |tabs AS (
       |  SELECT list(dots ORDER BY s) AS dot_tab, list(nsqs ORDER BY s) AS nsq_tab FROM (
       |    SELECT s, list(dotv ORDER BY c) AS dots, list(nsqv ORDER BY c) AS nsqs FROM (
       |      SELECT sp.s AS s, ci.c AS c,
       |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |               list_transform(range(1, 9), d ->
       |                 CAST(q.q_emb[sp.s * 8 + d] AS DOUBLE) *
       |                 b.cents[sp.s + 1][ci.c + 1][d])),
       |               (x, y) -> x + y) AS dotv,
       |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |               list_transform(b.cents[sp.s + 1][ci.c + 1], x -> x * x)),
       |               (x, y) -> x + y) AS nsqv
       |      FROM (SELECT unnest(range(0, 8)) AS s) sp,
       |           (SELECT unnest(range(0, 16)) AS c) ci, $bkF b, qv q)
       |    GROUP BY s)),
       |codes AS (
       |  SELECT emb.vec_id,
       |         list_transform(range(0, 8), s ->
       |           list_position(
       |             list_transform(range(0, 16), c -> ${dist(s"b", "s")}),
       |             list_min(
       |               list_transform(range(0, 16), c -> ${dist(s"b", "s")}))) - 1) AS codes
       |  FROM $src emb, $bkF b),
       |adc AS (
       |  SELECT co.vec_id,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(0, 8), s ->
       |             t.dot_tab[s + 1][co.codes[s + 1] + 1])),
       |           (x, y) -> x + y) AS adc_dot,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(0, 8), s ->
       |             t.nsq_tab[s + 1][co.codes[s + 1] + 1])),
       |           (x, y) -> x + y) AS adc_nsq
       |  FROM codes co, tabs t
       |  WHERE co.vec_id <> 0)
       |SELECT a.vec_id, a.adc_dot / (sqrt(a.adc_nsq) * qv.q_nrm) AS score
       |FROM adc a, qv
       |WHERE a.adc_nsq > 0
       |ORDER BY score DESC, a.vec_id
       |LIMIT 20""".stripMargin
  }

  /** E25 shared recon-chain generator: the seeded-PQ codebook/encode/
    * reconstruct CTEs over an arbitrary (norm-filtered, raw) source
    * pair — the unrotated report uses (e, embeddings), the E26 rotated
    * row uses (e2, rot) with suffixed CTE names, so the recon
    * arithmetic exists once for both codecs.
    */
  private def pqReconCtes(normSrc: String, rawSrc: String, sfx: String): String =
    s"""|cseed$sfx AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
        |  FROM $normSrc ORDER BY vec_id LIMIT 16),
        |cl$sfx AS (
        |  SELECT list(sc ORDER BY s) AS cents FROM (
        |    SELECT s, list(sv ORDER BY cid) AS sc FROM (
        |      SELECT sp.s AS s, c.cid AS cid,
        |             list_transform(range(1, 9),
        |               d -> CAST(c.embedding[sp.s * 8 + d] AS DOUBLE)) AS sv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cseed$sfx c)
        |    GROUP BY s)),
        |nsqt$sfx AS (
        |  SELECT list(nsqs ORDER BY s) AS nsq_tab FROM (
        |    SELECT s, list(nsqv ORDER BY cid) AS nsqs FROM (
        |      SELECT sp.s AS s, c.cid AS cid,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS nsqv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cseed$sfx c)
        |    GROUP BY s)),
        |codes$sfx AS (
        |  SELECT emb.vec_id,
        |         list_transform(range(0, 8), s ->
        |           list_position(
        |             list_transform(range(0, 16), c ->
        |               t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                   list_transform(range(1, 9), d ->
        |                     CAST(emb.embedding[s * 8 + d] AS DOUBLE) * cl$sfx.cents[s + 1][c + 1][d])),
        |                   (x, y) -> x + y)),
        |             list_min(
        |               list_transform(range(0, 16), c ->
        |                 t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                     list_transform(range(1, 9), d ->
        |                       CAST(emb.embedding[s * 8 + d] AS DOUBLE) * cl$sfx.cents[s + 1][c + 1][d])),
        |                     (x, y) -> x + y)))) - 1) AS codes
        |  FROM $rawSrc emb, cl$sfx, nsqt$sfx t),
        |pqr$sfx AS (
        |  SELECT vec_id, r_emb,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(r_emb) + 1),
        |             i -> r_emb[i] * r_emb[i])),
        |           (x, y) -> x + y)) AS r_nrm
        |  FROM (
        |    SELECT co.vec_id,
        |           flatten(list_transform(range(0, 8),
        |             s -> cl$sfx.cents[s + 1][co.codes[s + 1] + 1])) AS r_emb
        |    FROM codes$sfx co, cl$sfx)
        |  WHERE r_nrm > 0)""".stripMargin

  /** E25 oracle, round 10: the sq8 + pq blocks unchanged, plus the
    * pq_opq codec — the SAME recon chain over the rotated corpus
    * measured against the rotated originals (orthogonality preserves
    * true cosines, so the two error columns are directly comparable).
    */
  private def quantErrorOracleSql: String =
    s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |qs AS (
        |  SELECT vec_id, qmin,
        |         CASE WHEN qmax > qmin THEN (qmax - qmin) / 255.0 ELSE 1.0 END AS qstep
        |  FROM (SELECT vec_id,
        |               CAST(list_min(embedding) AS DOUBLE) AS qmin,
        |               CAST(list_max(embedding) AS DOUBLE) AS qmax
        |        FROM embeddings)),
        |deq AS (
        |  SELECT e.vec_id,
        |         list_transform(e.embedding, x ->
        |           CAST(s.qmin +
        |             ((CAST(round((CAST(x AS DOUBLE) - s.qmin) / s.qstep) AS INTEGER) - 128)
        |              + 128) * s.qstep AS REAL)) AS r_emb
        |  FROM embeddings e JOIN qs s ON e.vec_id = s.vec_id),
        |sq8n AS (
        |  SELECT vec_id, r_emb,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(r_emb) + 1),
        |             i -> CAST(r_emb[i] AS DOUBLE) * CAST(r_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS r_nrm
        |  FROM deq
        |  WHERE r_nrm > 0)""".stripMargin + ",\n" +
      pqReconCtes("e", "embeddings", "") + ",\n" +
      opqRotCtes("embeddings") + ",\n" +
      s"""e2 AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
       |           (x, y) -> x + y)) AS nrm
       |  FROM rot
       |  WHERE nrm > 0)""".stripMargin + ",\n" +
      pqReconCtes("e2", "rot", "2") + "\n" +
      s"""|SELECT 'sq8' AS codec, e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(r.r_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (e.nrm * r.r_nrm) AS recon_cos
        |FROM e JOIN sq8n r ON e.vec_id = r.vec_id
        |UNION ALL
        |SELECT 'pq' AS codec, e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * r.r_emb[i])),
        |         (x, y) -> x + y) / (e.nrm * r.r_nrm) AS recon_cos
        |FROM e JOIN pqr r ON e.vec_id = r.vec_id
        |UNION ALL
        |SELECT 'pq_opq' AS codec, e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * r.r_emb[i])),
        |         (x, y) -> x + y) / (e.nrm * r.r_nrm) AS recon_cos
        |FROM e2 e JOIN pqr2 r ON e.vec_id = r.vec_id""".stripMargin

  private def baseOracles: Map[String, String] = Map(
    // E20: e1's scoring CTE unlimited, the metadata join, a per-source
    // QUALIFY cap, and the global top-k — ranks are integers over the
    // hash-matched scores, so tie resolution is engine-identical.
    "e20_capped_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |sc AS (
        |  SELECT e.vec_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |  FROM e, q WHERE e.vec_id <> 0),
        |r AS (
        |  SELECT s.vec_id, s.score, d.source,
        |         row_number() OVER (PARTITION BY d.source
        |                            ORDER BY s.score DESC, s.vec_id) AS src_rank
        |  FROM sc s JOIN documents d ON s.vec_id = d.doc_id)
        |SELECT vec_id, score, source, src_rank
        |FROM r WHERE src_rank <= 2
        |ORDER BY score DESC, vec_id
        |LIMIT 10""".stripMargin,

    // E19: the fixed-point recipe — floor(x·2^20) is exact (power-of-two
    // double multiply), the per-cell sums are integer (DuckDB HUGEINT
    // cast back to BIGINT, §6b), and the closing divisions are spelled
    // in the same left-to-right order as the Spark select.
    "e19_embedding_drift" ->
      """WITH q AS (
        |  SELECT vec_id % 2 = 0 AS is_ref,
        |         unnest(range(1, len(embedding) + 1)) AS dim,
        |         unnest(embedding) AS x
        |  FROM embeddings),
        |qq AS (
        |  SELECT is_ref, dim,
        |         CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS qx
        |  FROM q),
        |a AS (
        |  SELECT dim,
        |         CAST(sum(CASE WHEN is_ref THEN qx END) AS BIGINT) AS sref,
        |         count(CASE WHEN is_ref THEN 1 END) AS nref,
        |         CAST(sum(CASE WHEN NOT is_ref THEN qx END) AS BIGINT) AS sinc,
        |         count(CASE WHEN NOT is_ref THEN 1 END) AS ninc
        |  FROM qq GROUP BY 1)
        |SELECT CAST(dim AS BIGINT) AS dim,
        |       CAST(sref AS DOUBLE) / nref / CAST(1048576 AS DOUBLE) AS mean_ref,
        |       CAST(sinc AS DOUBLE) / ninc / CAST(1048576 AS DOUBLE) AS mean_inc,
        |       abs(CAST(sref AS DOUBLE) / nref / CAST(1048576 AS DOUBLE)
        |         - CAST(sinc AS DOUBLE) / ninc / CAST(1048576 AS DOUBLE)) AS drift
        |FROM a""".stripMargin,

    // E15: e3's routing CTEs (cells from the same 16 seeds, probe set =
    // query's top-2 cells) feeding e8's codebook/encode/ADC CTEs, with
    // the codes CTE restricted to the routed slice. One `cents` CTE
    // serves both halves — the Spark side seeds IVF and PQ from the
    // identical first-16-by-id vectors.
    "e15_ann_ivfpq" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding, nrm
        |  FROM e ORDER BY vec_id LIMIT 16),
        |qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |cscore AS (
        |  SELECT e.vec_id, c.cent_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * c.nrm) AS s
        |  FROM e, cents c
        |  WHERE e.vec_id <> 0),
        |cellof AS (
        |  SELECT vec_id, CAST(cent_id AS INTEGER) AS cell FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
        |    FROM cscore) WHERE rn = 1),
        |probes AS (
        |  SELECT cent_id FROM (
        |    SELECT c.cent_id,
        |           row_number() OVER (ORDER BY
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, len(c.embedding) + 1),
        |                 i -> CAST(c.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
        |               (x, y) -> x + y) / (c.nrm * qv.q_nrm) DESC, c.cent_id) AS rn
        |    FROM cents c, qv) WHERE rn <= 2),
        |routed AS (
        |  SELECT e.vec_id, e.embedding, co.cell
        |  FROM e JOIN cellof co ON e.vec_id = co.vec_id
        |  WHERE co.cell IN (SELECT cent_id FROM probes)),
        |cl AS (
        |  SELECT list(sc ORDER BY s) AS cents FROM (
        |    SELECT s, list(sv ORDER BY cent_id) AS sc FROM (
        |      SELECT sp.s AS s, c.cent_id AS cent_id,
        |             list_transform(range(1, 9),
        |               d -> CAST(c.embedding[sp.s * 8 + d] AS DOUBLE)) AS sv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cents c)
        |    GROUP BY s)),
        |tabs AS (
        |  SELECT list(dots ORDER BY s) AS dot_tab, list(nsqs ORDER BY s) AS nsq_tab FROM (
        |    SELECT s, list(dotv ORDER BY cent_id) AS dots, list(nsqv ORDER BY cent_id) AS nsqs FROM (
        |      SELECT sp.s AS s, c.cent_id AS cent_id,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(q.q_emb[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS dotv,
        |             list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |               list_transform(range(1, 9), d ->
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE) *
        |                 CAST(c.embedding[sp.s * 8 + d] AS DOUBLE))),
        |               (x, y) -> x + y) AS nsqv
        |      FROM (SELECT unnest(range(0, 8)) AS s) sp, cents c, qv q)
        |    GROUP BY s)),
        |codes AS (
        |  SELECT r.vec_id, r.cell,
        |         list_transform(range(0, 8), s ->
        |           list_position(
        |             list_transform(range(0, 16), c ->
        |               t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                   list_transform(range(1, 9), d ->
        |                     CAST(r.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                   (x, y) -> x + y)),
        |             list_min(
        |               list_transform(range(0, 16), c ->
        |                 t.nsq_tab[s + 1][c + 1] - 2.0 *
        |                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                     list_transform(range(1, 9), d ->
        |                       CAST(r.embedding[s * 8 + d] AS DOUBLE) * cl.cents[s + 1][c + 1][d])),
        |                     (x, y) -> x + y)))) - 1) AS codes
        |  FROM routed r, cl, tabs t),
        |adc AS (
        |  SELECT co.vec_id, co.cell,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             t.dot_tab[s + 1][co.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_dot,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(0, 8), s ->
        |             t.nsq_tab[s + 1][co.codes[s + 1] + 1])),
        |           (x, y) -> x + y) AS adc_nsq
        |  FROM codes co, tabs t)
        |SELECT a.vec_id, a.cell, a.adc_dot / (sqrt(a.adc_nsq) * qv.q_nrm) AS score
        |FROM adc a, qv
        |WHERE a.adc_nsq > 0
        |ORDER BY score DESC, a.vec_id
        |LIMIT 20""".stripMargin,

    "e17_ann_ivfpq_join" -> e17JoinSql(0L until 8L),

    // E17 at the PRODUCTION batch: 256 queries, 8× past the engine's
    // 32-query literal threshold, so this grades the broadcast-joined
    // model path end-to-end (SimilaritySpec pins bit-parity between
    // paths; this pins it against DuckDB too).
    "e17_join_q256" -> e17JoinSql(0L until 256L),

    // E8: centroid seeding, argmin encode, and ADC table lookups are all
    // deterministic double arithmetic; the 2-D tables are rebuilt in SQL
    // as ordered nested lists and every fold is an explicit left
    // list_reduce (an aggregate SUM would have engine-defined order).
    // E25: the e7 dequantize CTE and the e8 cseed/cl/codes CTEs (the
    // encode argmin needs only the centroid norms — the q-independent
    // half of e8's tabs), recon = flatten of per-subspace centroid
    // lookups, then one cosine fold per codec in the e1 spelling with
    // the recon norm guarded > 0 exactly like withNorm.
    "e25_quant_error" -> quantErrorOracleSql,

    "e8_ann_pq" -> pqSearchSql("embeddings"),

    // E8 learned: per-subspace Lloyd (2 iterations, seeded init,
    // floor-quantized BIGINT means) — the e4 recipe per subspace; see
    // lloydPqSql for the float-rounding parity of the encode dot.
    "e8_ann_pq_kmeans" -> lloydPqSql("embeddings", 2),

    // E26: the same seeded-PQ search over the md5-seeded orthogonal
    // rotation (OPQ-lite) — rotation CTEs prepended, search SQL shared
    // with e8 via one generator.
    "e26_ann_opq" -> pqSearchSql("rot", opqRotCtes("embeddings") + ",\n"),

    // E7: the SQ8 round trip is pure deterministic arithmetic — min/max
    // per vector, round() (ties away from zero in BOTH engines for the
    // non-negative scaled values), float32 reconstruction via CAST AS
    // REAL — so the compressed-corpus search reproduces exactly.
    // E11: e1's arithmetic with the threshold filter replacing the
    // top-k (threshold CAST AS DOUBLE — bare literal would be DECIMAL).
    "e11_radius_search" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |  FROM e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, score FROM s WHERE score >= CAST(0.2 AS DOUBLE)""".stripMargin,

    // E13: e1's arithmetic with a per-label QUALIFY — same fold, same
    // (score desc, vec_id) tiebreak within each class.
    "e13_knn_per_label" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |s AS (
        |  SELECT e.label, e.vec_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |  FROM e, q WHERE e.vec_id <> 0)
        |SELECT label, vec_id, score,
        |       CAST(row_number() OVER (PARTITION BY label
        |                               ORDER BY score DESC, vec_id) AS INT) AS rnk
        |FROM s
        |QUALIFY rnk <= 5""".stripMargin,

    // E12: e7's SQ8 scoring as the 50-candidate stage, exact cosine
    // over the raw vectors as the rerank — both stages' ties broken by
    // vec_id, so the composition is deterministic end-to-end.
    "e12_sq8_rerank" ->
      """WITH qs AS (
        |  SELECT vec_id, qmin,
        |         CASE WHEN qmax > qmin THEN (qmax - qmin) / 255.0 ELSE 1.0 END AS qstep
        |  FROM (SELECT vec_id,
        |               CAST(list_min(embedding) AS DOUBLE) AS qmin,
        |               CAST(list_max(embedding) AS DOUBLE) AS qmax
        |        FROM embeddings)),
        |deq AS (
        |  SELECT e.vec_id,
        |         list_transform(e.embedding, x ->
        |           CAST(s.qmin +
        |             ((CAST(round((CAST(x AS DOUBLE) - s.qmin) / s.qstep) AS INTEGER) - 128)
        |              + 128) * s.qstep AS REAL)) AS embedding
        |  FROM embeddings e JOIN qs s ON e.vec_id = s.vec_id),
        |d AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM deq
        |  WHERE nrm > 0),
        |qv AS (
        |  SELECT embedding AS q_emb,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS q_nrm
        |  FROM embeddings WHERE vec_id = 0 AND q_nrm > 0),
        |cand AS (
        |  SELECT d.vec_id
        |  FROM d, qv
        |  WHERE d.vec_id <> 0
        |  ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(d.embedding) + 1),
        |           i -> CAST(d.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (d.nrm * qv.q_nrm) DESC, d.vec_id
        |  LIMIT 50),
        |e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q2 AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q2.q_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (e.nrm * q2.q_nrm) AS score
        |FROM e JOIN cand USING (vec_id), q2
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "e7_ann_sq8" ->
      """WITH qs AS (
        |  SELECT vec_id, qmin,
        |         CASE WHEN qmax > qmin THEN (qmax - qmin) / 255.0 ELSE 1.0 END AS qstep
        |  FROM (SELECT vec_id,
        |               CAST(list_min(embedding) AS DOUBLE) AS qmin,
        |               CAST(list_max(embedding) AS DOUBLE) AS qmax
        |        FROM embeddings)),
        |deq AS (
        |  SELECT e.vec_id,
        |         list_transform(e.embedding, x ->
        |           CAST(s.qmin +
        |             ((CAST(round((CAST(x AS DOUBLE) - s.qmin) / s.qstep) AS INTEGER) - 128)
        |              + 128) * s.qstep AS REAL)) AS embedding
        |  FROM embeddings e JOIN qs s ON e.vec_id = s.vec_id),
        |d AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM deq
        |  WHERE nrm > 0),
        |qv AS (
        |  SELECT embedding AS q_emb,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS q_nrm
        |  FROM embeddings WHERE vec_id = 0 AND q_nrm > 0)
        |SELECT d.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(d.embedding) + 1),
        |           i -> CAST(d.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (d.nrm * qv.q_nrm) AS score
        |FROM d, qv
        |WHERE d.vec_id <> 0
        |ORDER BY score DESC, d.vec_id
        |LIMIT 20""".stripMargin,

    // E3: seeded centroids are the first 16 corpus vectors by id, cell
    // assignment is argmax with first-max tie (⇒ lowest cent_id), the
    // probe set is the query's top-2 cells by centroid cosine — all
    // deterministic double arithmetic in the same fold order. The SQL
    // comes from ivfOracleSql(2): ONE generator parameterized on the
    // probe count, shared verbatim with the e23 sweep.
    "e3_ann_ivf" -> ivfOracleSql(2),

    // E4: the learned-centroid IVF earns a full oracle (round 12) by
    // fixing every free choice of the fit — seeded init, 2 Lloyd
    // iterations, floor-quantized integer-sum means — see
    // lloydOracleSql for the portability inventory.
    "e4_ann_ivf_kmeans" -> lloydOracleSql(16, 2, 2, 20),

    // E2 is exactly reproducible now that the LSH planes are md5-derived:
    // the multi-probe set {q_bucket} ∪ {one flipped bit} is precisely
    // hamming distance ≤ 1 on the 6-bit keys — bit_count(xor(...)) ≤ 1.
    "e2_ann_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, len(embedding) + 1),
         |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
         |           (x, y) -> x + y)) AS nrm
         |  FROM embeddings
         |  WHERE nrm > 0),
         |b AS (
         |  SELECT vec_id, embedding, nrm,
         |         ${bucketSql("embedding")} AS bucket
         |  FROM e),
         |q AS (SELECT embedding AS q_emb, nrm AS q_nrm, bucket AS q_bucket FROM b WHERE vec_id = 0)
         |SELECT b.vec_id, b.bucket,
         |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |         list_transform(range(1, len(b.embedding) + 1),
         |           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
         |         (x, y) -> x + y) / (b.nrm * q.q_nrm) AS score
         |FROM b, q
         |WHERE b.vec_id <> 0 AND bit_count(xor(b.bucket, q.q_bucket)) <= 1
         |ORDER BY score DESC, b.vec_id
         |LIMIT 20""".stripMargin,

    "e5_knn_join" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |  FROM e, q WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, score, rnk FROM (
        |  SELECT q_id, vec_id, score,
        |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 10""".stripMargin,

    // E9: e1's arithmetic + an EXISTS pre-filter on the metadata table.
    "e9_filtered_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |FROM e, q
        |WHERE e.vec_id <> 0
        |  AND EXISTS (SELECT 1 FROM documents d
        |              WHERE d.doc_id = e.vec_id AND d.lang = 'en')
        |ORDER BY score DESC, e.vec_id
        |LIMIT 20""".stripMargin,

    "e1_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(1, len(e.embedding) + 1),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |         (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |FROM e, q WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id
        |LIMIT 20""".stripMargin,

    // E10: the greedy MMR selection replayed as a recursive CTE — each
    // iteration's working table is the single row selected last step;
    // the correlated max-sim scan plus QUALIFY row_number()=1 picks the
    // same (mmr desc, vec_id) argmax the driver greedy takes. Both
    // weights are spelled as the same decimal literals the Scala side
    // uses (0.7 / 0.3) — deriving 0.3 as 1.0-0.7 would be DECIMAL-exact
    // here but IEEE-inexact in Scala, a one-ulp argmax hazard.
    "e10_mmr_topk" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(embedding) + 1),
        |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |  WHERE nrm > 0),
        |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |cand AS (
        |  SELECT e.vec_id, e.embedding, e.nrm,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (e.nrm * q.q_nrm) AS score
        |  FROM e, q WHERE e.vec_id <> 0
        |  ORDER BY score DESC, e.vec_id
        |  LIMIT 20),
        |pairs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, len(a.embedding) + 1),
        |             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
        |           (x, y) -> x + y) / (a.nrm * b.nrm) AS sim
        |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
        |sel(step, vec_id, relevance, mmr, selected) AS (
        |  SELECT 1, vec_id, score, 0.7 * score, [vec_id]
        |  FROM (SELECT * FROM cand ORDER BY score DESC, vec_id LIMIT 1)
        |  UNION ALL
        |  SELECT sel.step + 1, c.vec_id, c.score,
        |         0.7 * c.score - 0.3 * (SELECT max(p.sim) FROM pairs p
        |            WHERE p.va = c.vec_id AND list_contains(sel.selected, p.vb)) AS mmr_v,
        |         list_append(sel.selected, c.vec_id)
        |  FROM sel, cand c
        |  WHERE sel.step < 10 AND NOT list_contains(sel.selected, c.vec_id)
        |  QUALIFY row_number() OVER (ORDER BY mmr_v DESC, c.vec_id) = 1
        |)
        |SELECT step AS rank, vec_id, relevance, mmr FROM sel""".stripMargin
  )
}
