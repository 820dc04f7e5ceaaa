package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join equivalence: spreading hot keys must never change the
  * join result, only the partitioning.
  */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // key 1 is pathologically hot
    val big = ((1 to 500).map(i => (1, i)) ++ Seq((2, 9001), (3, 9002)))
      .toDF("k", "line")
    val small = Seq((1, "hot"), (2, "cold"), (4, "unused")).toDF("k", "v")

    val plain = big.join(small, Seq("k")).select("k", "line", "v")
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("line"), buckets = 8)
      .select("k", "line", "v")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted left join keeps unmatched fact rows") {
    import spark.implicits._
    val big = Seq((1, 10), (9, 20)).toDF("k", "line")
    val small = Seq((1, "x")).toDF("k", "v")
    val rows = Skew.saltedJoin(big, small, Seq("k"), col("line"), 4, "left")
      .collect().map(r => (r.getInt(0), r.isNullAt(2))).toSet
    assert(rows === Set((1, false), (9, true)))
  }

  test("salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val big = (1 to 100).map(i => (1, i)).toDF("k", "line")
    val salts = big.withColumn("s", pmod(xxhash64(col("line")), lit(8L)))
      .select("s").distinct().count()
    assert(salts > 4, s"hot key only reached $salts of 8 buckets")
  }

  test("salting-as-data: the heavy-hitter table flips the plan, never the rows") {
    import spark.implicits._
    import graft.operators.Fraud
    // pure decision semantics, pinned (the threshold lives in ONE place)
    assert(Skew.shouldSalt(maxHotRows = 51, totalRows = 1000, hotShare = 0.05))
    assert(!Skew.shouldSalt(maxHotRows = 50, totalRows = 1000, hotShare = 0.05))
    assert(!Skew.shouldSalt(maxHotRows = 10, totalRows = 0))

    // engineered skew corpus (the c1_skew fact): the b32-shaped hitter
    // table must nominate the hot key and the compiled plan must salt
    val auto = Skew.queries("c1_skew_auto")(spark, SF)
    val autoPlan = auto.queryExecution.executedPlan.toString
    assert(autoPlan.contains("__graft_salt"),
      s"engineered skew must compile the salted join:\n$autoPlan")
    val plain = Skew.queries("c1_skew_plain")(spark, SF)
    assert(auto.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(auto).count() === 0)

    // uniform corpus (the raw fact, no hot-key remap): same code path,
    // same threshold — compiles the PLAIN join, and equals it
    val tx = Fraud.transactions(spark, SF)
    val uniform = Skew.adaptiveSaltedJoin(tx,
      Fraud.users(spark, SF).hint("shuffle_hash"), Seq("user_id"),
      hitters = Skew.hotKeyCounts(tx, "user_id"), totalRows = tx.count(),
      saltFrom = col("tx_okey") * 8 + col("tx_lineno"), buckets = 16,
      joinType = "left")
    val uniformPlan = uniform.queryExecution.executedPlan.toString
    assert(!uniformPlan.contains("__graft_salt"),
      s"a uniform corpus must compile the plain join:\n$uniformPlan")
    val plainJoin = tx.join(Fraud.users(spark, SF).hint("shuffle_hash"),
      Seq("user_id"), "left")
    assert(uniform.count() === plainJoin.count())
  }

  test("c1_skew_salted ≡ c1_skew_plain on the synthetic hot-key enrich") {
    val plain = Skew.queries("c1_skew_plain")(spark, SF)
    val salted = Skew.queries("c1_skew_salted")(spark, SF)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // the hot key really is hot: one country carries ≥ 70% of rows
    val counts = plain.collect().map(r => r.getLong(1))
    assert(counts.max.toDouble / counts.sum > 0.7, counts.mkString(","))
  }
}
