package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Cols._
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
