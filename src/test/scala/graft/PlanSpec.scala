package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the PLANS.md audit claims, asserted so
  * a refactor cannot silently degrade a physical plan the scale design
  * depends on. String-level checks against explain output — the same
  * evidence the audit reads.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SF).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("b1 filter+project: predicates reach the parquet scan") {
    val p = plan("b1_filter_project")
    assert(p.contains("PushedFilters: ["), p.linesIterator.take(20).mkString("\n"))
    assert(!p.replaceAll("PushedFilters: \\[\\]", "").contains("PushedFilters: []"),
      "scan has an EMPTY PushedFilters list")
  }

  test("c1 enrich: dims broadcast, at most one non-broadcast fact-fact join") {
    val p = plan("c1_fraud_enrich")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    val smj = "SortMergeJoin".r.findAllIn(p).size
    // formatted mode lists each operator in the tree AND the details
    // section, so counts are doubled. At sf0.001 even the fact-fact
    // join may broadcast (orders is tiny — AQE working as intended), so
    // the invariant is: >=4 broadcast joins, <=1 sort-merge join, and
    // never a cartesian product.
    assert(bhj >= 8, s"expected >=4 broadcast joins (x2 in formatted), got $bhj\n$p")
    assert(smj <= 2, s"expected <=1 sort-merge join (x2 in formatted), got $smj")
    assert(!p.contains("CartesianProduct"))
  }

  test("b23 range join: broadcast calendar, no distinct-over-fact derivation") {
    val p = plan("b23_range_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"calendar side must broadcast\n$p")
    // the calendar derivation is a scalar min/max aggregate now: the plan
    // must not contain a distinct (HashAggregate keyed on the truncated
    // month) feeding the broadcast — two scans max (bounds + join side)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 4, s"expected <=2 events scans (x2 in formatted), got $scans")
  }

  test("b31 funnel: the three chained window minima share ONE exchange") {
    val p = SparkEntry.queries("b31_funnel")(spark, SF)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"funnel must shuffle once, got $exchanges\n$p")
  }

  test("d11 decontamination: benchmark grams broadcast, corpus never distinct-shuffled for grams") {
    val p = plan("d11_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bench grams must broadcast\n$p")
  }

  test("e5 knn join: WindowGroupLimit prunes before the final rank") {
    val p = plan("e5_knn_join")
    assert(p.contains("WindowGroupLimit"), s"partial top-k pushdown missing\n$p")
  }
}
