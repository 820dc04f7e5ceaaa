package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The pure-SQL surface: tables registered as temp views + graft's
  * native expressions registered as SQL functions — a reference user
  * can drive the engine with `spark.sql(...)` alone.
  */
class SqlSpec extends AnyFunSuite with SparkTestBase {

  private def registerViews(): Unit =
    Tables.all.foreach { name =>
      Tables.table(spark, SF, name).createOrReplaceTempView(name)
    }

  test("SQL: registered views + native functions answer an end-to-end query") {
    registerViews()
    graft.functions.GraftFunctions.register(spark)
    // the fraud trend in plain SQL over the registered views
    val sql = spark.sql(
      """SELECT o_orderpriority AS payment_method,
        |       count(*) AS n_tx,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val df = graft.operators.Fraud.transactions(spark, SF)
      .groupBy(col("payment_method"))
      .agg(count(lit(1)).as("n_tx"),
        sum(col("amount").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sql === df)
  }

  test("SQL: native minhash_sig matches the Column API") {
    registerViews()
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig(t.sh) AS mh FROM (
        |  SELECT doc_id,
        |         transform(sequence(0, size(split(text, ' ')) - 3), i ->
        |           concat_ws(' ', element_at(split(text, ' '), i + 1),
        |                          element_at(split(text, ' '), i + 2),
        |                          element_at(split(text, ' '), i + 3))) AS sh
        |  FROM documents WHERE size(split(text, ' ')) >= 3) t
        |LIMIT 20""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = graft.sources.Tables.table(spark, SF, "documents")
      .select(col("doc_id"), graft.operators.Dedup.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), graft.operators.Dedup.shingles(col("tok")).as("sh"))
      .select(col("doc_id"),
        graft.functions.MinHashFunctions.minhashSig(col("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaSql.foreach { case (id, sig) => assert(viaCols(id) === sig, s"doc $id") }
  }
}
