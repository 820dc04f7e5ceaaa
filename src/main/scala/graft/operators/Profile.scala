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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
