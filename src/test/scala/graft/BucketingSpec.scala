package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Co-located (bucketed) joins — the SURVEY §5 scale claim that the
  * repeatedly-joined fact tables shuffle once at write time, then never
  * again: a join of two tables bucketed on the key must contain NO
  * Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("join of co-bucketed tables is shuffle-free") {
    val li = Tables.table(spark, SF, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.table(spark, SF, "orders")
      .select("o_orderkey", "o_custkey")
    Tables.writeBucketed(li, "graft_li_bucketed", "l_orderkey", 8)
    Tables.writeBucketed(o, "graft_o_bucketed", "o_orderkey", 8)
    try {
      // force the join path (not broadcast) so the Exchange check is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }
}
