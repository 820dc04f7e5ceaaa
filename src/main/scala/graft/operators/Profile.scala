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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
