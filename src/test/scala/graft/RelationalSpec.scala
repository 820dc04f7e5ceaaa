package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Plan-shape and semantics checks for the relational core (SURVEY §2 B*).
  * Value-level correctness is the DuckDB oracle's job (Verify harness);
  * these specs assert the *plans* scale: pushdown reaches the scan and
  * the dimension join broadcasts.
  */
class RelationalSpec extends AnyFunSuite with SparkTestBase {

  test("B1 filter+projection push down to the parquet scan") {
    val df = Relational.queries("b1_filter_project")(spark, SF)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the comparison predicates themselves reach the scan, not just IsNotNull
    assert(plan.contains("GreaterThan(l_discount,0.05)"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // projection pruned to the 4 selected + 2 filter columns
    assert(!plan.contains("l_tax"), plan)
  }

  test("B3d dimension join is a broadcast join (fact side unshuffled)") {
    val df = Relational.queries("b3_join_broadcast")(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("B3b/B3c semi and anti partition the customer set") {
    val semi = Relational.queries("b3_join_semi")(spark, SF).count()
    val anti = Relational.queries("b3_join_anti")(spark, SF).count()
    val all = graft.sources.Tables.table(spark, SF, "customer").count()
    assert(semi + anti === all)
    assert(semi > 0 && anti > 0)
  }

  test("B9 merge-upsert keeps exactly one (latest) row per key") {
    val df = Relational.queries("b9_upsert_latest")(spark, SF)
    val users = df.select("user_id").distinct().count()
    assert(df.count() === users)
  }

  test("B23 range join broadcasts the interval dim (no corpus shuffle for the join)") {
    val plan = Relational.queries("b23_range_join")(spark, SF)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("B12 top-k is ordered and bounded") {
    val rows = Relational.queries("b12_topk")(spark, SF).collect()
    assert(rows.length === 100)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("B28 merged HLL estimate tracks the exact distinct count") {
    val est = Relational.queries("b28_hll_merge")(spark, SF).collect()(0)
      .getAs[Long]("merged_distinct_custkeys")
    val exact = graft.sources.Tables.table(spark, SF, "orders")
      .select("o_custkey").distinct().count()
    assert(math.abs(est - exact) <= 0.05 * exact,
      s"estimate $est vs exact $exact drifts > 5%")
  }

  test("B32 approx frequent items contain every exact heavy hitter") {
    val exact = Relational.queries("b32_heavy_hitters")(spark, SF)
      .collect().map(_.getLong(0)).toSet
    val approx = Relational.queries("b32_heavy_hitters_approx")(spark, SF)
      .collect().map(_.getLong(0)).toSet
    // freqItems guarantees a superset of items above the support
    assert(exact.subsetOf(approx),
      s"missing hitters: ${exact.diff(approx)}")
  }

  test("B35 count-min estimates never under-count; threshold keeps a superset") {
    val exact = Relational.queries("b32_heavy_hitters")(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cms = Relational.queries("b35_heavy_hitters_cms")(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // CMS collisions only ADD, so every exact heavy hitter survives the
    // same threshold with est >= its true count
    exact.foreach { case (k, n) =>
      assert(cms.contains(k), s"heavy hitter $k missing from CMS result")
      assert(cms(k) >= n, s"CMS under-counted $k: ${cms(k)} < $n")
    }
  }

  test("B36 portable HLL tracks exact NDV; register-max merge equals one-shot") {
    val one = Relational.queries("b36_distinct_hll")(spark, SF).collect()(0)
    val merged = Relational.queries("b36_hll_merge")(spark, SF).collect()(0)
    assert(one === merged,
      "register-wise max of per-slice sketches must reproduce the one-shot estimate")
    val exact = graft.sources.Tables.table(spark, SF, "lineitem")
      .select("l_orderkey").distinct().count()
    val est = one.getAs[Double]("est_ndv")
    assert(math.abs(est - exact) <= 0.2 * exact,
      s"HLL(m=256) estimate $est vs exact $exact drifts > 20%")
    // grouped form: each group's registers estimate ITS distinct count
    import org.apache.spark.sql.functions.{col, countDistinct}
    val grouped = Relational.queries("b36_hll_grouped")(spark, SF).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_ndv")).toMap
    val exactG = graft.sources.Tables.table(spark, SF, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped.keySet === exactG.keySet)
    grouped.foreach { case (g, e) =>
      assert(math.abs(e - exactG(g)) <= 0.2 * exactG(g),
        s"group $g: estimate $e vs exact ${exactG(g)} drifts > 20%")
    }
  }

  test("I14 SCD2: intervals never overlap; current rows equal the i7 latest-wins apply") {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val h = Relational.queries("i14_scd2_history")(spark, SF)
    // no overlap: version n closes at or before version n+1 opens (a
    // gap is legal exactly when a delete sat between the two versions;
    // the formatted timestamp compares lexicographically)
    val a = h.select(col("user_id"), col("version"), col("valid_to"))
    val b = h.select(col("user_id"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val overlaps = a.join(b, Seq("user_id", "version"))
      .filter(col("valid_to") > col("next_from")).count()
    assert(overlaps === 0, s"$overlaps overlapping version intervals")
    // every non-final version is closed; at most one open (current) per key
    val badOpen = h.groupBy(col("user_id"))
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"),
        count(lit(1)).as("n"))
      .filter(col("n_open") > 1).count()
    assert(badOpen === 0, "a key has more than one current version")
    // the current rows ARE the i7 latest-wins result (same change
    // stream, so the open-interval row must be i7's surviving row)
    val cur = h.filter(col("is_current"))
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val i7 = Relational.queries("i7_cdc_apply")(spark, SF)
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cur === i7, "SCD2 current rows diverge from the CDC latest-wins apply")
  }

  test("B38 KMV tracks exact NDV; bucket-min merge equals one-shot; set ops bounded") {
    import org.apache.spark.sql.functions.col
    val one = Relational.queries("b38_kmv_distinct")(spark, SF).collect()(0)
    val merged = Relational.queries("b38_kmv_merge")(spark, SF).collect()(0)
    assert(one === merged,
      "bucket-wise min of per-slice sketches must reproduce the one-shot estimate")
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
    val exact = li.select("l_orderkey").distinct().count()
    val est = one.getAs[Double]("est_ndv")
    assert(math.abs(est - exact) <= 0.2 * exact,
      s"KMV(k=256) estimate $est vs exact $exact drifts > 20%")
    // set ops: each direct estimate within 20% of its exact
    // counterpart; the intersection — a DIFFERENCE of three ±1/√k
    // estimates — has error scale ~ the union size, not the (possibly
    // tiny) intersection, so its bound is relative to u
    val so = Relational.queries("b38_kmv_setops")(spark, SF).collect()(0)
    def ndv(flags: String*) = li
      .filter(col("l_returnflag").isin(flags: _*))
      .select("l_orderkey").distinct().count().toDouble
    val (a, b, u) = (ndv("A"), ndv("R"), ndv("A", "R"))
    val i = a + b - u
    val checks = Seq(("est_a", a), ("est_b", b), ("est_union", u))
    checks.foreach { case (name, exactV) =>
      val e = so.getAs[Double](name)
      assert(math.abs(e - exactV) <= 0.2 * exactV,
        s"$name=$e vs exact $exactV drifts > 20%")
    }
    val ei = so.getAs[Double]("est_intersect")
    assert(math.abs(ei - i) <= 0.2 * u,
      s"est_intersect=$ei vs exact $i drifts > 20% of union $u")
    assert(math.abs(so.getAs[Double]("jaccard_est") - i / u) <= 0.1,
      s"jaccard_est ${so.getAs[Double]("jaccard_est")} vs exact ${i / u}")
  }

  test("B37 histogram quantiles within one cell of exact; cell-add merge equals one-shot") {
    import org.apache.spark.sql.functions.{col, max, min}
    val one = Relational.queries("b37_quantile_hist")(spark, SF).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val merged = Relational.queries("b37_hist_merge")(spark, SF).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(one === merged,
      "cell-wise addition of per-slice histograms must reproduce the one-shot estimate")
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
    val mm = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).collect()(0)
    val cell = (mm.getDouble(1) - mm.getDouble(0)) / 64.0
    one.foreach { case (q, v) =>
      val exact = li.stat.approxQuantile("l_extendedprice", Array(q), 0.0)(0)
      assert(math.abs(v - exact) <= cell,
        s"q=$q estimate $v vs exact $exact is off by more than one cell width ($cell)")
    }
  }

  test("B24b approx quartiles agree with exact ntile away from boundaries") {
    val exact = Relational.queries("b24_ntile")(spark, SF)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2)))
    val approx = Relational.queries("b24_ntile_approx")(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(exact.length === approx.size)
    // the sketch may misplace customers whose totals sit exactly at a
    // quartile boundary (ties / interpolation); everyone else must agree
    val boundary = exact.map(_._2._1).sorted.reverse
    val qVals = Seq(1, 2, 3).map(q => boundary((boundary.length * q / 4.0).toInt - 1)).toSet
    val (checked, mismatched) = exact.foldLeft((0, 0)) {
      case ((c, m), (key, (total, q))) =>
        if (qVals.exists(v => math.abs(v - total) < 1e-6)) (c, m)
        else (c + 1, if (approx(key) == q) m else m + 1)
    }
    assert(checked > exact.length / 2, s"boundary exclusion ate the sample: $checked")
    assert(mismatched.toDouble / checked <= 0.02,
      s"$mismatched of $checked off-boundary customers disagree with exact ntile")
  }

  test("B43b histogram rank is within one cell's mass of the exact percent_rank") {
    import org.apache.spark.sql.functions.col
    // key includes x: the synthetic lineitem's (orderkey, linenumber) is
    // NOT unique (≈23% dup rows), and both rank forms are pure functions
    // of (group, x) — ties collapse to identical values, so the Map is
    // lossless for this comparison
    def keyed(name: String, rankCol: String) =
      Relational.queries(name)(spark, SF).collect()
        .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
          r.getAs[Double]("x")) ->
          ((r.getAs[String]("l_returnflag"), r.getAs[Double](rankCol)))).toMap
    val exact = keyed("b43_feature_scale", "pct_rank")
    val approx = keyed("b43_feature_scale_approx", "pct_rank_approx")
    assert(exact.keySet === approx.keySet)
    // error bound: below-mass rank can differ from the true rank by at
    // most the population of the row's own cell, so per group the gap is
    // ≤ max cell mass / (n − 1)
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
    val groupN = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val worst = exact.iterator.map { case (k, (rf, e)) =>
      math.abs(e - approx(k)._2) * (groupN(rf) - 1) }.max
    val maxCell = groupN.values.max / 8.0 // sanity ceiling: cells are ~n/128, allow 16x skew
    assert(worst <= maxCell,
      s"histogram rank off by $worst rows — exceeds any plausible cell mass ($maxCell)")
    // and the ranks must agree closely in absolute terms
    val maxAbs = exact.iterator.map { case (k, (_, e)) =>
      math.abs(e - approx(k)._2) }.max
    assert(maxAbs <= 0.05, s"max |approx − exact| = $maxAbs > 0.05")
  }

  test("I7 CDC apply keeps latest change and honors trailing deletes") {
    import spark.implicits._
    val changes = Seq(
      (1, "U", 10.0, "2024-01-01 10:00:00"),
      (1, "U", 20.0, "2024-01-01 11:00:00"),  // latest for key 1
      (2, "U", 30.0, "2024-01-01 10:00:00"),
      (2, "D", 0.0, "2024-01-01 12:00:00"),   // trailing delete
      (3, "D", 0.0, "2024-01-01 10:00:00"),
      (3, "U", 40.0, "2024-01-01 11:00:00"))  // re-insert after delete
      .toDF("k", "op", "v", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val out = graft.sources.Tables.applyCdc(changes, Seq("k"), Seq($"ts"), "op")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out === Map(1 -> 20.0, 3 -> 40.0))
  }

  test("I4 load diff classifies added/removed/changed with column lists") {
    import spark.implicits._
    val load1 = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status")
    val load2 = Seq((2L, 20.0, "B"), (3L, 35.0, "X"), (4L, 40.0, "D"))
      .toDF("k", "price", "status")
    val out = graft.sources.Tables.loadDiff(load1, load2, "k", Seq("price", "status"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) === (("removed", "")))
    assert(out(2L) === (("unchanged", "")))
    assert(out(3L) === (("changed", "price,status")))
    assert(out(4L) === (("added", "")))
  }

  test("B43 feature scaling: bounds, per-group rank endpoints, centered z-scores") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("b43_feature_scale")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mm, pr) = (r.getAs[Double]("minmax"), r.getAs[Double]("pct_rank"))
      assert(mm >= 0.0 && mm <= 1.0, s"minmax $mm out of range")
      assert(pr >= 0.0 && pr <= 1.0, s"pct_rank $pr out of range")
    }
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (g, rs) =>
      // percent_rank endpoints: the group min sits at 0, the max at 1
      assert(rs.map(_.getAs[Double]("pct_rank")).min === 0.0, s"group $g")
      assert(rs.map(_.getAs[Double]("pct_rank")).max === 1.0, s"group $g")
      // z-scores center on zero (8dp rounding noise only)
      val zMean = rs.map(_.getAs[Double]("zscore")).sum / rs.length
      assert(math.abs(zMean) < 1e-4, s"group $g z-mean $zMean not centered")
      // and min-max hits both ends
      assert(rs.map(_.getAs[Double]("minmax")).min === 0.0)
      assert(rs.map(_.getAs[Double]("minmax")).max === 1.0)
    }
  }

  test("B44 streaks: hand-built islands resolve exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val dir = tmpDir("graft_streaks")
    def nanos(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000000L
    // user 1: days 1-3 then 5-6 (streaks 3+2); user 2: one day, twice
    // (distinct must collapse same-day events); user 3: two isolated days
    val rows = Seq(
      (1L, 1L, "2024-03-01 09:00:00"), (2L, 1L, "2024-03-02 09:00:00"),
      (3L, 1L, "2024-03-03 09:00:00"), (4L, 1L, "2024-03-05 09:00:00"),
      (5L, 1L, "2024-03-06 09:00:00"),
      (6L, 2L, "2024-03-10 08:00:00"), (7L, 2L, "2024-03-10 20:00:00"),
      (8L, 3L, "2024-03-01 12:00:00"), (9L, 3L, "2024-03-03 12:00:00"))
    rows.map { case (e, u, t) => (e, u, nanos(t), 1.0) }
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("b44_activity_streaks")(spark, dir).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("longest_streak"), x.getAs[Long]("n_streaks"),
          x.getAs[Long]("n_active_days")))).toMap
    assert(r(1L) === ((3L, 2L, 5L)))
    assert(r(2L) === ((1L, 1L, 1L)))
    assert(r(3L) === ((1L, 2L, 2L)))
  }

  test("B37c grouped histogram quantiles land within one bucket width of the exact per-group percentile") {
    import org.apache.spark.sql.functions.{col, expr}
    val est = SparkEntry.queries("b37_hist_grouped")(spark, SF).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("quantile")) ->
        r.getAs[Double]("est_value")).toMap
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"),
        expr("(max(l_extendedprice) - min(l_extendedprice)) / 64.0").as("bw"))
      .collect()
    exact.foreach { r =>
      val (g, bw) = (r.getString(0), r.getAs[Double]("bw"))
      assert(math.abs(est((g, 0.5)) - r.getAs[Double]("p50")) <= bw,
        s"group $g p50: est ${est((g, 0.5))} vs exact ${r.getAs[Double]("p50")} (bw $bw)")
      assert(math.abs(est((g, 0.95)) - r.getAs[Double]("p95")) <= bw,
        s"group $g p95")
    }
  }

  test("B47 windowed-HLL error: raw-range days track exact within HLL theory bounds") {
    // the 256-register raw estimator's theoretical std error is
    // 1.04/sqrt(256) ~ 6.5%; measured mean ~4.6% / max ~20% on the
    // real corpus. The margins (mean <= 12%, max <= 30%) are set above
    // any plausible regeneration — the spec pins the ACCURACY CLAIM on
    // steady-state (exact >= 2.5*m) windows, which ramp-up days are
    // scoped out of by the b45 docstring.
    // sf0.01, not the spec-default sf0.001: the smaller corpus has NO
    // day above the 640 raw-range floor (window NDV ~150), so the
    // accuracy claim is only testable at the verify scale
    val rows = SparkEntry.queries("b47_window_hll_error")(
        spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[Long]("exact_ndv"), r.getAs[Double]("rel_err")))
    val steady = rows.filter(_._1 >= 640L)
    assert(steady.length > 100, s"need steady-state days, got ${steady.length}")
    val errs = steady.map(_._2)
    assert(errs.sum / errs.length <= 0.12,
      s"mean rel_err ${errs.sum / errs.length} above the theory margin")
    assert(errs.max <= 0.30, s"max rel_err ${errs.max} above the tail margin")
  }

  test("B49 salted pre-cut is a no-op on the result: bottom-k composes") {
    // the extreme-scale path (rank within (day, salt), keep k, then
    // the day cut) must be BIT-IDENTICAL to the direct day cut — the
    // i25 bottom-k composition law, pinned on the real corpus so the
    // pre-cut can be flipped on at any scale without re-validation
    import org.apache.spark.sql.functions.{col, concat_ws, to_date}
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
      .select(to_date(col("l_shipdate")).as("ship_day"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("key"))
    def rows(preCut: Int) = R.dailySampleCells(li, preCutSalts = preCut)
      .collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("day_num"),
        r.getAs[String]("key"), r.getAs[Long]("hk"))).toSet
    val direct = rows(0)
    assert(direct.nonEmpty)
    assert(rows(8) === direct, "8-salt pre-cut must not change the cells")
    assert(rows(3) === direct, "3-salt pre-cut must not change the cells")
  }
}
