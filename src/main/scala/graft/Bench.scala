package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Each query is fully materialized through the `noop` sink — a plain
  * count() would let Catalyst prune the very expressions being measured
  * (e.g. the fraud-score projection collapses to a join-count).
  */
object Bench {

  /** Headline set: one representative per operator family, weighted
    * toward the scan/join/agg shapes that dominate at 100 TB.
    */
  val headline: Seq[String] = Seq(
    "b1_filter_project", "b3_join_inner", "b3_join_broadcast",
    "b5_agg_basic", "b6_approx_distinct", "b8_sliding_window",
    "b9_upsert_latest", "b11_rank_topn", "b16_session_window", "b22_asof_join",
    "c1_fraud_enrich", "c5_fraud_score", "c6_user_spend_trend",
    "c7_category_trend", "c11_zscore", "c15_trailing_window",
    "b30_gapfill", "i4_load_diff", "i5_quality_audit",
    "d1_dedup_exact", "d2_minhash_lsh", "d4_ngram_jaccard",
    "d5_embed_neardup", "d8_dedup_clusters", "d9_embed_clusters",
    "e1_cosine_topk", "e2_ann_lsh", "e3_ann_ivf", "e5_knn_join",
    "f2_quality", "f3_token_count", "f4_fingerprint", "f7_repetition",
    "f8_pii_redact", "f10_keywords", "g1_multimodal_meta",
    "g4_embed_batched")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Full untimed warm-up pass: whole-stage-codegen class generation +
    // JIT compilation is a one-time per-plan cost (~8s observed on the
    // minhash sketch) that would otherwise land on whichever query runs
    // it first. Same data dir so AQE re-plans identically and the second
    // (measured) pass reuses the compiled classes — steady-state numbers.
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
        }
      }
    }

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        }
      }
    }
    val streaming = streamingThroughput(spark, sfDir)
    val all = results ++ streaming
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = all
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** End-to-end streaming measure: the transaction fact rendered to CSV
    * (the reference's wire format), streamed through watermark +
    * stream-static enrichment + rule scoring into a noop sink. Reported
    * as `h1_stream_pipeline` seconds for the full table, plus
    * `h1_stream_bigbatch` with 4× the micro-batch size — the
    * batch-size/latency trade (fewer, larger batches amortize per-batch
    * planning; the reference's consumer makes the same trade with its
    * BATCH_SIZE knob).
    */
  private def streamingThroughput(spark: SparkSession,
                                  sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    import graft.operators.Fraud
    import graft.sources.Tables
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_stream").toString
      val users = graft.sources.Tables.table(spark, sfDir, "customer")
        .join(broadcast(Tables.table(spark, sfDir, "nation")),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey").cast("int").as("user_id"),
          col("c_name").as("name"), lit("u@x").as("email"),
          col("n_name").as("country"),
          lit("2020-01-01 00:00:00").cast("timestamp").as("signup_date"))
      val products = Tables.table(spark, sfDir, "part")
        .select(col("p_partkey").cast("int").as("product_id"),
          col("p_name").as("name"), col("p_type").as("category"),
          col("p_retailprice").as("base_price"), lit("acme").as("supplier"),
          lit("FRANCE").as("country"), lit(true).as("in_stock"),
          (col("p_retailprice") % 30).as("discount"))
      Fraud.transactions(spark, sfDir)
        .select(col("transaction_id"), col("user_id").cast("int"),
          col("product_id").cast("int"), lit("s1").as("store_id"),
          col("amount"), col("payment_method"), lit("FRANCE").as("country"),
          col("ts").as("timestamp"))
        .repartition(16)
        .write.option("header", "true").csv(s"$tmp/in")
      def run(label: String, maxFilesPerTrigger: Int): (String, Double) =
        try {
          val t0 = System.nanoTime()
          val q = graft.streaming.FraudStream
            .scoredStream(Tables.readCsvStream(spark, s"$tmp/in",
              Tables.transactionSchema, maxFilesPerTrigger), users, products)
            .writeStream
            .option("checkpointLocation", s"$tmp/ckpt_$label")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.format("noop").mode("overwrite").save()
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          label -> (System.nanoTime() - t0) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $label failed: ${e.getMessage}")
            label -> -1.0
        }
      // untimed warm-up run: the streaming plan pays the same one-time
      // codegen/JIT cost as the batch queries — without this the first
      // measured variant absorbs it and the batch-size comparison is
      // an ordering artifact
      run("warmup", 16)
      Seq(run("h1_stream_pipeline", 4), run("h1_stream_bigbatch", 16))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] streaming failed: ${e.getMessage}")
        Seq("h1_stream_pipeline" -> -1.0, "h1_stream_bigbatch" -> -1.0)
    }
  }
}
