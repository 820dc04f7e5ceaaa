package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native expression semantics + SQL registration (graft.functions). */
class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("md5_prefix60 equals the portable conv(substr(md5)) formulation") {
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT md5_prefix60(s) AS native,
        |       CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) AS portable
        |FROM VALUES ('abc'), (''), ('key agg row scan'), ('日本語テキスト') AS t(s)""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
    // known value, cross-checked against DuckDB's
    // CAST('0x'||substr(md5('abc'),1,15) AS BIGINT)
    val abc = spark.sql("SELECT md5_prefix60('abc')").collect()(0).getLong(0)
    assert(abc === 648541476951500027L)
  }

  test("hll_rho52 equals the portable bin/ltrim bitlength form on random and edge longs") {
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val edges = Seq(0L, 1L, 2L, (1L << 52) - 1, 1L << 52, Long.MaxValue, -1L, Long.MinValue)
    val values = (edges ++ Seq.fill(200)(rng.nextLong() >>> rng.nextInt(64)))
      .map(v => s"(CAST($v AS BIGINT))").mkString(", ")
    val rows = spark.sql(
      s"""SELECT hll_rho52(w) AS native,
         |       53 - length(trim(LEADING '0' FROM bin(w))) AS portable
         |FROM VALUES $values AS t(w)""".stripMargin).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1), r))
  }

  test("float_vec_dot is SQL-callable and matches the fold bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT float_vec_dot(a, b) AS native,
        |       aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
        |                 0d, (acc, v) -> acc + v) AS folded
        |FROM VALUES (array(CAST(0.1 AS FLOAT), CAST(-2.5 AS FLOAT), CAST(3.25 AS FLOAT)),
        |             array(CAST(7.5 AS FLOAT), CAST(0.3 AS FLOAT), CAST(-1.125 AS FLOAT))) AS t(a, b)""".stripMargin)
      .collect()(0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
           java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("minhash_sig equals the composable shingleHashes∘minhashes form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "key agg row scan slow fast table value part hash merge batch"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.Dedup.shingles(
        graft.operators.Dedup.tokens(col("text"))).as("sh"))
    val native = docs.select(col("doc_id"),
      graft.functions.MinHashFunctions.minhashSig(col("sh")).as("mh")).collect()
    val composable = docs
      .select(col("doc_id"), graft.operators.Dedup.shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id"), graft.operators.Dedup.minhashes(col("hs")).as("mh")).collect()
    val n = native.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = composable.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n === c)
    assert(n(1L).length === 16)
  }

  test("null inputs propagate") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT md5_prefix60(CAST(NULL AS STRING)),
        |       float_vec_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(NULL AS ARRAY<FLOAT>))""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
