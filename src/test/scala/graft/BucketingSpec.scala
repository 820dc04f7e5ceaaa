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

  test("D18 production shape: persisted band table makes the delta collision join one-sided") {
    import graft.operators.Dedup
    val docs = Tables.table(spark, SF, "documents")
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    // the previous load persisted its bands bucketed on the COMBINED
    // band key (band_id embedded — the planner only reuses a bucketed
    // layout when the bucket column IS the join key, so a compound
    // (band_id, band_key) join would re-shuffle both sides): the base
    // side of the collision join then needs NO exchange — only the
    // (small) delta side shuffles. This is the "never re-sketch,
    // never re-shuffle the corpus" claim of SURVEY D18, asserted on a
    // real plan.
    def keyed(df: org.apache.spark.sql.DataFrame, idAs: String) =
      Dedup.lshBands(df).select(col("doc_id").as(idAs),
        concat_ws(":", col("band_id"), col("band_key")).as("bkey"))
    Tables.writeBucketed(keyed(base, "base_id"), "graft_bands_bucketed", "bkey", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bands_bucketed")
        .join(keyed(delta, "delta_id"), Seq("bkey"))
        .select(least(col("base_id"), col("delta_id")).as("doc_a"),
          greatest(col("base_id"), col("delta_id")).as("doc_b"))
      val plan = joined.queryExecution.executedPlan.toString
      // the only KEYED shuffle allowed is the delta side's bkey
      // exchange (lshBands' round-robin CPU-spread is a narrow-stage
      // repartition, not a join shuffle); the base side must scan
      // bucketed with no exchange at all
      val keyedExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(keyedExchanges === 1,
        s"only the delta side may hash-shuffle (got $keyedExchanges):\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"base side must use the bucketed layout:\n$plan")
      // and the result equals the inline cross-pair computation
      val persisted = joined.distinct().collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // incrementalCandidates includes delta-delta pairs; the persisted
      // join covers base-delta only, so compare against that subset
      val inline: Set[(Long, Long)] = Dedup.incrementalCandidates(base, delta)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      val crossOnly = inline.filter { case (a, b) => (a % 7 == 0) != (b % 7 == 0) }
      assert(persisted === crossOnly,
        "the persisted-table join must reproduce the inline base-delta pairs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bands_bucketed")
    }
  }

  test("D23b production shape: persisted prefix table makes the delta collision join one-sided") {
    import graft.operators.Dedup
    val docs = Tables.table(spark, SF, "documents")
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    // the previous load's persisted index: base shingles → frozen df
    // order → prefixes; the PREFIX table is what every future delta's
    // collision join scans, so it persists A12-bucketed on its join
    // key `s` (a single column — the round-6 lesson: the planner only
    // reuses a bucketed layout when the bucket column IS the join key)
    val shBase = Dedup.setSimShingles(base)
    val dfBase = shBase.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val prefBase = Dedup.setSimPrefixes(shBase, dfBase, 7, 10)
    Tables.writeBucketed(prefBase.select(col("doc_id").as("base_id"), col("s")),
      "graft_pref_bucketed", "s", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the delta pass materializes its (small) prefix cut first — in
      // production it lands as the NEXT load's index slice — so the
      // collision join below is exactly the per-load recurring cost
      val prefDelta = Dedup.setSimPrefixes(Dedup.setSimShingles(delta),
        dfBase, 7, 10)
        .select(col("doc_id").as("delta_id"), col("s"))
        .localCheckpoint(true)
      val joined = spark.table("graft_pref_bucketed")
        .join(prefDelta, Seq("s"))
        .select(least(col("base_id"), col("delta_id")).as("doc_a"),
          greatest(col("base_id"), col("delta_id")).as("doc_b"))
      val plan = joined.queryExecution.executedPlan.toString
      // only the delta side may exchange; the base prefix table scans
      // its bucketed layout with no shuffle at all
      val keyedExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(keyedExchanges === 1,
        s"only the delta side may hash-shuffle (got $keyedExchanges):\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"base side must use the bucketed layout:\n$plan")
      val persisted = joined.distinct().collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // equals the inline (table-free) cross-candidate computation...
      val inlineCross = prefBase.as("a")
        .join(prefDelta.as("b"), col("a.s") === col("b.s"))
        .select(least(col("doc_id"), col("delta_id")).as("doc_a"),
          greatest(col("doc_id"), col("delta_id")).as("doc_b"))
        .distinct().collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(persisted === inlineCross,
        "the persisted-table join must reproduce the inline base-delta candidates")
      // ...and LOSSLESS: it covers every verified base×delta pair
      val truth = Dedup.setSimJoinIncremental(base, delta).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .filter { case (a, b) => (a % 7 == 0) != (b % 7 == 0) }.toSet
      assert(truth.subsetOf(persisted),
        "prefix-filter candidates must contain every true delta-touching pair")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_pref_bucketed")
    }
  }
}
