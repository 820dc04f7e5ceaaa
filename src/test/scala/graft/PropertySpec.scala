package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Fraud}

/** Property-style checks over generated corpora (fixed-seed scalacheck
  * generators, so runs are reproducible): the native sketch must agree
  * with its composable reference form on arbitrary inputs, and the
  * verification metrics must satisfy their mathematical invariants.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
    "value", "part", "hash", "merge", "batch", "spark", "window", "join")

  private def genDocs(n: Int, seed: Long): Seq[(Long, String)] = {
    val gen = Gen.listOfN(n,
      Gen.chooseNum(3, 40).flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab))))
    val lists = gen.apply(Gen.Parameters.default, Seed(seed)).get
    lists.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
  }

  test("native minhash_sig equals the composable form on 60 random docs") {
    import spark.implicits._
    val docs = (genDocs(30, 7L) ++ genDocs(30, 99L).map { case (i, t) => (i + 100, t) })
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(Dedup.tokens(col("text"))).as("sh"))
    val native = docs.select(col("doc_id"),
      graft.functions.MinHashFunctions.minhashSig(col("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composable = docs
      .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id"), Dedup.minhashes(col("hs")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === composable)
  }

  test("jaccard over random candidates stays in [0,1] and hits 1 only for equal sets") {
    import spark.implicits._
    val docs = genDocs(40, 13L).toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(docs)
    val verified = Dedup.ngramJaccard(docs, cand).collect()
    verified.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0, s"jaccard out of range: $r")
    }
    // identical docs always produce a jaccard-1 candidate pair
    val dup = (Seq((900L, "key agg row scan slow fast"), (901L, "key agg row scan slow fast")))
      .toDF("doc_id", "text")
    val dj = Dedup.ngramJaccard(dup, Dedup.minhashCandidates(dup)).collect()
    assert(dj.exists(r => r.getAs[Double]("jaccard") === 1.0))
  }

  test("I2/I3: split assignment is total+stable; stratified sample respects fractions") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val assigned = graft.operators.Profile.splitAssign(docs, "doc_id")
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === docs.count())
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // stability: re-running assigns identical splits
    val a1 = assigned.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = graft.operators.Profile.splitAssign(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 === a2)

    val strata = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = docs.stat.sampleBy("lang", Map("en" -> 0.5, "es" -> 0.25, "zh" -> 0.1), 42L)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.foreach { case (lang, n) => assert(n <= strata(lang)) }
    assert(math.abs(sampled("en").toDouble / strata("en") - 0.5) < 0.15)
  }

  test("D8 clusters match a driver-side union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(5L, 17L, 23L)) {
      val n = 60
      val edgeGen = Gen.listOfN(80,
        Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
      val rawEdges = edgeGen.apply(Gen.Parameters.default, Seed(seed)).get
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference: plain union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      rawEdges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> {
        // canonical label = min id in the component
        val root = find(i)
        (0 until n).filter(j => find(j) == root).min.toLong
      }).toMap
      val docs = (0L until n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val pairs = rawEdges.toDF("doc_a", "doc_b")
      val got = Dedup.clustersFromPairs(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("I4 loadDiff(a, a) reports nothing; removed side is total") {
    val orders = graft.sources.Tables.table(spark, SF, "orders")
    val self = graft.sources.Tables.loadDiff(orders, orders, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"))
      .filter(col("change_type") =!= "unchanged")
    assert(self.count() === 0, "identical loads must diff clean")
    val empty = orders.limit(0)
    val gone = graft.sources.Tables.loadDiff(orders, empty, "o_orderkey",
      Seq("o_totalprice", "o_orderstatus"))
    assert(gone.filter(col("change_type") === "removed").count() === orders.count())
  }

  test("I7 applyCdc equals a driver-side fold on random change streams") {
    import spark.implicits._
    for (seed <- Seq(3L, 11L)) {
      val gen = Gen.listOfN(120, Gen.zip(
        Gen.chooseNum(0, 9), Gen.oneOf("U", "U", "U", "D"), Gen.chooseNum(1, 999)))
      val changes = gen.apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((k, op, v), i) => (k, op, v.toDouble, i.toLong) }
      // reference: fold in version order, delete removes the key
      val expected = changes.sortBy(_._4).foldLeft(Map.empty[Int, Double]) {
        case (m, (k, "D", _, _)) => m - k
        case (m, (k, _, v, _)) => m.updated(k, v)
      }
      val got = graft.sources.Tables.applyCdc(
          changes.toDF("k", "op", "v", "ver"), Seq("k"),
          Seq(org.apache.spark.sql.functions.col("ver")), "op")
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("B30 gap-fill emits exactly span-days x dims rows, zeros where empty") {
    val out = graft.operators.Relational.queries("b30_gapfill")(spark, SF)
    val days = out.select("day").distinct().count()
    val dims = out.select("o_orderpriority").distinct().count()
    assert(out.count() === days * dims, "every (day, dim) cell present exactly once")
    val zeros = out.filter(col("n_orders") === 0)
    assert(zeros.count() > 0, "sf0.001 must have empty cells")
    assert(zeros.filter(col("day_sales") =!= 0.0).count() === 0)
  }

  test("minhash candidate pairs are ordered, distinct, and id-bounded") {
    import spark.implicits._
    val docs = genDocs(50, 21L).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b }, "pairs must be ordered a < b")
    assert(pairs.distinct.length === pairs.length, "pairs must be distinct")
    assert(pairs.forall { case (a, b) => a >= 0 && b < 50 })
  }

  test("C18 closed form equals the sequential recurrence on random series") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // 40 random per-user spend series (fixed seed): the window identity
    // S_t = P_t - min(0, min P) must equal the literal fold
    // S_t = max(0, S_{t-1} + (x - 50)) in exact decimal, for every
    // prefix, including series that pin to zero repeatedly
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(0, 20000)))
    val raw = gen.apply(Gen.Parameters.default, Seed(21L)).get
    val dir = tmpDir("graft_cusum_prop")
    val rows = raw.zipWithIndex.map { case ((u, cents), i) =>
      (i.toLong, u.toLong,
        (1704100000000000000L + i.toLong * 60000000000L),
        cents.toDouble / 100.0)
    }
    rows.toDF("event_id", "user_id", "ts", "value")
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val engine = graft.operators.Fraud.queries("c18_cusum_shift")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("cusum")).toMap
    // driver fold in exact decimal, per user in event order
    val k = new java.math.BigDecimal("50.0").setScale(6)
    val zero = java.math.BigDecimal.ZERO.setScale(6)
    val want = rows.groupBy(_._2).flatMap { case (_, evs) =>
      var s = zero
      evs.sortBy(e => (e._3, e._1)).map { e =>
        val dev = java.math.BigDecimal.valueOf(e._4)
          .setScale(6, java.math.RoundingMode.HALF_UP).subtract(k)
        s = s.add(dev); if (s.signum() < 0) s = zero
        e._1 -> s.doubleValue
      }
    }
    want.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(engine(id)) ===
        java.lang.Double.doubleToLongBits(v), s"event $id: ${engine(id)} != $v")
    }
  }

  test("B44 streak invariants on random day sets: lengths partition the distinct days") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val gen = Gen.listOfN(300, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(0, 59)))
    val raw = gen.apply(Gen.Parameters.default, Seed(77L)).get
    val dir = tmpDir("graft_streak_prop")
    val rows = raw.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, u.toLong, 1704067200000000000L + day.toLong * 86400000000000L)
    }
    rows.toDF("event_id", "user_id", "ts")
      .withColumn("value", lit(1.0))
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("b44_activity_streaks")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("n_active_days")))).toMap
    val byUser = raw.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byUser.foreach { case (u, days) =>
      val (longest, nStreaks, nActive) = out(u.toLong)
      assert(nActive === days.size.toLong, s"user $u: day count")
      // recompute islands directly from the set: an island starts at a
      // day with no predecessor; its length is the run of successors
      val sorted = days.toSeq.sorted
      val islands = sorted.count(d => !days.contains(d - 1))
      val longestWant = sorted.map { d =>
        Iterator.from(0).takeWhile(k => days.contains(d + k)).size
      }.max
      assert(nStreaks === islands.toLong, s"user $u: islands")
      assert(longest === longestWant.toLong, s"user $u: longest")
    }
  }

  test("C22 MAD flag set is invariant to inflating the flagged outlier") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // median/MAD have a 50% breakdown point: multiplying an already-
    // flagged outlier by 100 must not change WHICH events flag
    def run(outlier: Double): Set[Long] = {
      val dir = tmpDir("graft_mad_prop")
      val vals = Seq(8.0, 9.0, 10.0, 10.0, 11.0, 12.0, 9.5, 10.5, 11.5, outlier)
      vals.zipWithIndex.map { case (v, i) =>
        (i.toLong + 1, 1L, 1704100000000000000L + i.toLong * 60000000000L, v) }
        .toDF("event_id", "user_id", "ts", "value")
        .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      graft.operators.Fraud.queries("c22_mad_anomaly")(spark, dir)
        .collect().map(_.getAs[Long]("event_id")).toSet
    }
    val base = run(1000.0)
    assert(base === Set(10L))
    assert(run(100000.0) === base, "inflating the outlier must not move the flag set")
    // the plain z-score DOES move: sigma scales with the outlier — the
    // robustness contrast is the operator's reason to exist (documented
    // in the c22 scaladoc; asserted here only for the robust form)
  }

  test("aggregation-order independence: decimal-folded scores are bit-identical across partitionings") {
    // THE cluster-size-independence claim behind every §6b FP recipe,
    // asserted directly: the same operator over the same rows split
    // into different partition counts (different partial-aggregation
    // orders) must produce doubleToLongBits-identical results. A raw
    // double SUM() would fail this; the decimal folds cannot.
    import graft.operators.{Profile, TextAnalysis}
    import graft.sources.Tables
    val docs = Tables.table(spark, SF, "documents")
    def bits(df: org.apache.spark.sql.DataFrame, key: String, v: String) =
      df.collect().map(r => r.getAs[Any](key) ->
        java.lang.Double.doubleToLongBits(r.getAs[Double](v))).toMap
    def invariant(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                  key: String, v: String, label: String): Unit = {
      val a = bits(f(docs.repartition(3)), key, v)
      val b = bits(f(docs.repartition(17)), key, v)
      assert(a.nonEmpty && a === b, s"$label drifted across partitionings")
    }
    invariant(TextAnalysis.bigramLogprob, "doc_id", "mean_logprob", "f17 bigram LM")
    invariant(TextAnalysis.zipfSlope(_), "n_terms", "slope", "f20 Zipf slope")
    invariant(Profile.mixtureWeights(_), "source", "weight", "i19 mixture weights")
    invariant(TextAnalysis.novelty(_), "doc_id", "novelty", "f18 novelty")
    invariant(d => TextAnalysis.sourceKlDivergence(d), "source", "kl_div", "f14 KL")
  }

  test("F21b top-K cut on random cell tables: totals mass-preserved, bounded cells, degenerate at K >= |vocab|") {
    import spark.implicits._
    import graft.operators.{Fraud, TextAnalysis}
    val gen = Gen.listOfN(60, for {
      c0 <- Gen.chooseNum(0L, 500L)
      c1 <- Gen.chooseNum(0L, 500L)
    } yield (c0, c1))
    for (seed <- Seq(5L, 21L, 77L)) {
      val counts = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val cells = counts.zipWithIndex
        .map { case ((c0, c1), i) => (f"t$i%03d", c0, c1) }
        .toDF("term", "c0", "c1")
        // a (0,0) term exists in neither corpus — the full-outer join
        // that builds real cell tables can never produce it
        .filter(col("c0") > 0 || col("c1") > 0)
      def one(df: org.apache.spark.sql.DataFrame) = {
        val rs = df.collect(); assert(rs.length === 1); rs.head
      }
      val exact = one(Fraud.psiFromCells(cells.select(col("c0"), col("c1"))))
      // the tail fold is an integer sum, so the grand totals — PSI's
      // denominator and every mass term's n0/n1 — are EXACTLY the
      // exact form's, whatever K keeps
      val cut = one(TextAnalysis.psiTopKFromCells(cells, topK = 8))
      assert(cut.getAs[Long]("n0") === exact.getAs[Long]("n0"), s"seed $seed n0")
      assert(cut.getAs[Long]("n1") === exact.getAs[Long]("n1"), s"seed $seed n1")
      assert(cut.getAs[Long]("n_cells_used") <= 9L, s"seed $seed cell bound")
      // K >= |vocab|: every cell is top, the tail is the filtered-out
      // (0,0) cell — the cut IS the exact statistic, bit for bit
      val degen = one(TextAnalysis.psiTopKFromCells(cells, topK = 1000))
      assert(java.lang.Double.doubleToLongBits(degen.getAs[Double]("psi")) ===
        java.lang.Double.doubleToLongBits(exact.getAs[Double]("psi")), s"seed $seed degenerate psi")
      assert(degen.getAs[Long]("n_cells_used") === exact.getAs[Long]("n_cells_used"))
    }
  }

  test("C34 decay invariants on random event sets: time-translation and dyadic value scaling are exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, to_timestamp}
    val gen = org.scalacheck.Gen.listOfN(120, for {
      u <- org.scalacheck.Gen.chooseNum(1L, 12L)
      d <- org.scalacheck.Gen.chooseNum(0, 29)
      hh <- org.scalacheck.Gen.chooseNum(0, 23)
      cents <- org.scalacheck.Gen.chooseNum(1L, 999999L)
    } yield (u, d, hh, cents / 100.0))
    for (seed <- Seq(11L, 42L)) {
      val rows = gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed)).get.zipWithIndex.map {
        case ((u, d, hh, v), i) =>
          (i.toLong, u, f"2024-01-${d + 1}%02d $hh%02d:00:00", v)
      }
      val ev = rows.toDF("event_id", "user_id", "ts", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts")).as("ts"), col("value"))
      def keyed(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
        graft.operators.Fraud.decayedSpend(df).collect()
          .map(r => r.getAs[Long]("user_id") ->
            ((r.getAs[Long]("n_recent"), r.getAs[Double]("decayed_spend")))).toMap
      val base = keyed(ev)
      // decay depends only on RELATIVE age: shifting every event by a
      // week changes nothing, bit for bit
      val shifted = keyed(ev.withColumn("ts", expr("ts + INTERVAL 7 DAYS")))
      assert(shifted.view.mapValues(x => (x._1,
        java.lang.Double.doubleToLongBits(x._2))).toMap ===
        base.view.mapValues(x => (x._1,
          java.lang.Double.doubleToLongBits(x._2))).toMap, s"seed $seed translation")
      // doubling every value doubles the feature EXACTLY (all weights
      // are powers of two and the decimal algebra is exact)
      val doubled = keyed(ev.withColumn("value", col("value") * 2))
      base.foreach { case (u, (n, v)) =>
        assert(doubled(u)._1 === n)
        assert(doubled(u)._2 === v * 2, s"seed $seed user $u dyadic scaling")
      }
    }
  }

  test("D23 prefix filtering is LOSSLESS: equals brute-force all-pairs Jaccard on random corpora") {
    import spark.implicits._
    for (seed <- Seq(3L, 17L)) {
      // random base docs + engineered near-dup copies (one word
      // APPENDED: Jaccard (n−4)/(n−3) ≥ 0.7 for n ≥ 7 tokens) so the
      // >= 0.7 band is populated, not vacuously empty
      val base = genDocs(30, seed)
      val docsSeq = base ++ base.filter(_._2.split(" ", -1).length >= 10)
        .take(6).map { case (id, t) => (id + 100L, t + " appended") }
      val out = Dedup.setSimJoin(docsSeq.toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          ((r.getAs[Long]("inter"), r.getAs[Long]("un")))).toMap
      def shingles(t: String): Set[String] = {
        val tok = t.split(" ", -1)
        if (tok.length < 5) Set.empty
        else (0 to tok.length - 5).map(i => tok.slice(i, i + 5).mkString(" ")).toSet
      }
      val sets = docsSeq.map { case (id, t) => id -> shingles(t) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sets
        (b, sb) <- sets if a < b
        inter = (sa & sb).size
        un = sa.size + sb.size - inter
        if 10 * inter >= 7 * un
      } yield (a, b) -> ((inter.toLong, un.toLong))).toMap
      assert(want.nonEmpty, s"seed $seed produced no true pairs - fixture broken")
      assert(out === want,
        s"seed $seed: prefix filtering must be exact - no misses, no extras")
    }
  }

  test("D23c refreshed-index losslessness: equals brute force on random corpora") {
    import spark.implicits._
    // the refresh claim under test: the order FREEZES over the base
    // alone (delta1 and delta2 shingles absent from it all rank at
    // df 0), yet the two-generation composition must still find every
    // true delta2-touching pair — losslessness needs only a consistent
    // total order, not a rarity-accurate one
    for (seed <- Seq(3L, 17L)) {
      val base0 = genDocs(30, seed)
      val docsSeq = base0 ++ base0.filter(_._2.split(" ", -1).length >= 10)
        .take(6).map { case (id, t) => (id + 100L, t + " appended") }
      // three-way residue split; a near-dup copy (id+100 ≡ id+1 mod 3)
      // always lands in a DIFFERENT slice than its original, so
      // cross-generation true pairs exist by construction
      val all = docsSeq.toDF("doc_id", "text")
      val out = Dedup.setSimJoinRefreshed(
        all.filter(col("doc_id") % 3 === 2),
        all.filter(col("doc_id") % 3 === 0),
        all.filter(col("doc_id") % 3 === 1)).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          ((r.getAs[Long]("inter"), r.getAs[Long]("un")))).toMap
      def shingles(t: String): Set[String] = {
        val tok = t.split(" ", -1)
        if (tok.length < 5) Set.empty
        else (0 to tok.length - 5).map(i => tok.slice(i, i + 5).mkString(" ")).toSet
      }
      val sets = docsSeq.map { case (id, t) => id -> shingles(t) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sets
        (b, sb) <- sets if a < b
        if a % 3 == 1 || b % 3 == 1
        inter = (sa & sb).size
        un = sa.size + sb.size - inter
        if 10 * inter >= 7 * un
      } yield (a, b) -> ((inter.toLong, un.toLong))).toMap
      assert(want.nonEmpty, s"seed $seed produced no delta2-touching pairs - fixture broken")
      assert(out === want,
        s"seed $seed: refreshed-index filtering must be exact - no misses, no extras")
    }
  }

  test("B49 closure law: window >= span makes the last day the GLOBAL bottom-k sample exactly") {
    // the windowed sample is the one-shot bottom-k restricted to a
    // trailing frame — at windowDays >= the corpus span the last day's
    // frame covers everything, so its k rows must equal the global
    // bottom-k over the whole fact under the same salt (i25's law with
    // days as the shards). Seals that the cell/re-cut composition
    // cannot drift from the sample family it extends.
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, max => fmax, to_date}
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
      .select(to_date(col("l_shipdate")).as("ship_day"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("key"))
    val win = R.windowSample(R.dailySampleCells(li), windowDays = 1000000)
    val lastDay = win.agg(fmax(col("ship_day"))).head().getDate(0)
    val got = win.filter(col("ship_day") === lastDay).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("key"), r.getAs[Long]("hk")))
      .sortBy(_._1)
    val global = li.select(col("key"),
        graft.functions.HashFunctions
          .md5Prefix60(concat(lit("wsamp:"), col("key"))).as("hk"))
      .orderBy(col("hk"), col("key")).limit(100).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i + 1L, r.getAs[String]("key"), r.getAs[Long]("hk")) }
    assert(got.toSeq === global.toSeq,
      "all-span windowed sample must equal the one-shot global bottom-k")
  }

  test("B50 exactness where the cells are complete: equals brute-force trailing top-k") {
    // the m=256 daily cut is a NO-OP at every verify scale (per-day
    // key cardinality maxes at 253 at sf0.1 — sized before building,
    // §6b), so the windowed counts must be EXACT here: compare against
    // a brute-force trailing count over the raw fact. The claim runs
    // where its precondition holds (the b47 lesson) — and the
    // precondition itself is asserted, so a corpus regeneration that
    // breaks it fails loudly instead of silently weakening the test.
    import org.apache.spark.sql.functions.{col, concat_ws, to_date}
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
      .select(to_date(col("l_shipdate")).as("ship_day"),
        col("l_suppkey").as("key"))
    val perDay = li.groupBy(col("ship_day"), col("key")).count()
      .groupBy(col("ship_day")).count().collect().map(_.getLong(1))
    assert(perDay.max <= 256,
      s"cells no longer complete at this scale (max ${perDay.max} keys/day) - retune m")
    val got = R.windowTopK(R.dailyTopCells(li)).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("rk")) ->
        ((r.getAs[Long]("key"), r.getAs[Long]("w_count")))).toMap
    // brute force: every (day, key) trailing count from the raw rows
    val rows = li.collect().map(r => (r.getDate(0), r.getAs[Long]("key")))
    val dayNums = rows.map(_._1.toLocalDate.toEpochDay).distinct.sorted
    val byDayKey = rows.groupBy(t => (t._1.toLocalDate.toEpochDay, t._2))
      .view.mapValues(_.length.toLong).toMap
    val want = dayNums.flatMap { d =>
      // toSeq before mapping to counts: keys is a SET, and mapping a
      // set of composite keys to their count VALUES deduplicates equal
      // counts before the sum
      val counts = byDayKey.keys.toSeq.filter(k => k._1 <= d && k._1 > d - 60)
        .groupBy(_._2).map { case (k, cells) =>
          k -> cells.map(byDayKey).sum }
      counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).zipWithIndex
        .map { case ((k, c), i) =>
          (java.time.LocalDate.ofEpochDay(d).toString, i + 1L) -> ((k, c)) }
    }.toMap
    val diff = (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k))
    assert(diff.isEmpty,
      s"windowed top-k must equal the brute-force trailing counts exactly; " +
        s"${diff.size} diffs, first: " +
        diff.take(3).map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; "))
  }

  test("B50 grid branch (r15): compact key universe takes the RANGE-window " +
    "form and still equals brute force") {
    // windowTopK picks between the serve-day expansion and the dense
    // day×key grid from measured cardinalities (grid iff days×keys <=
    // 8×cells). The sparse suppkey corpus above exercises the
    // expansion; this twin compacts the key universe (key % 3) so the
    // grid branch fires — the precondition is asserted, and the output
    // must STILL equal the brute-force trailing counts (both forms are
    // exact integer sums over the same cells).
    import org.apache.spark.sql.functions.{col, to_date, pmod, lit, countDistinct}
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
      .select(to_date(col("l_shipdate")).as("ship_day"),
        pmod(col("l_suppkey"), lit(3L)).as("key"))
    val cells0 = R.dailyTopCells(li)
    val nCells = cells0.count()
    val nDays = cells0.select(col("ship_day")).distinct().count()
    val nKeys = cells0.select(col("key")).distinct().count()
    assert(nDays * nKeys <= nCells * 8L,
      s"compacted corpus no longer takes the grid branch " +
        s"(days=$nDays keys=$nKeys cells=$nCells) - retune the modulus")
    val got = R.windowTopK(R.dailyTopCells(li)).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("rk")) ->
        ((r.getAs[Long]("key"), r.getAs[Long]("w_count")))).toMap
    val rows = li.collect().map(r => (r.getDate(0), r.getAs[Long]("key")))
    val dayNums = rows.map(_._1.toLocalDate.toEpochDay).distinct.sorted
    val byDayKey = rows.groupBy(t => (t._1.toLocalDate.toEpochDay, t._2))
      .view.mapValues(_.length.toLong).toMap
    val want = dayNums.flatMap { d =>
      val counts = byDayKey.keys.toSeq.filter(k => k._1 <= d && k._1 > d - 60)
        .groupBy(_._2).map { case (k, cells) =>
          k -> cells.map(byDayKey).sum }
      counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).zipWithIndex
        .map { case ((k, c), i) =>
          (java.time.LocalDate.ofEpochDay(d).toString, i + 1L) -> ((k, c)) }
    }.toMap
    val diff = (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k))
    assert(diff.isEmpty,
      s"grid-branch windowed top-k must equal brute-force trailing counts; " +
        s"${diff.size} diffs, first: " +
        diff.take(3).map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; "))
  }

  test("B45/B46 closure law: window >= span makes the last day the GLOBAL sketch exactly") {
    // the windowed sketches are the global ones restricted to a
    // trailing frame — at windowDays >= the corpus span the last day's
    // frame covers everything, so its row must be bit-identical to the
    // one-shot b36/b37 estimates (same registers, same estimator
    // spelling). Seals that the window forms cannot drift from the
    // family they extend.
    import org.apache.spark.sql.functions.{max => fmax, to_date}
    import java.lang.Double.doubleToLongBits
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
    val wide = 1000000
    val keyedH = li.select(to_date(col("l_shipdate")).as("ship_day"),
      col("l_orderkey"))
    val winH = R.windowHllFromCells(R.dailyHllCells(keyedH, "l_orderkey"), wide)
    val lastDay = winH.agg(fmax(col("ship_day"))).head().getDate(0)
    val lastH = winH.filter(col("ship_day") === lastDay).head()
    val globalH = R.queries("b36_distinct_hll")(spark, SF).head()
    assert(doubleToLongBits(lastH.getDouble(1)) ===
      doubleToLongBits(globalH.getDouble(0)),
      "all-span windowed HLL estimate must equal the global b36 estimate")
    assert(lastH.getLong(2) === globalH.getLong(1))
    val keyedQ = li.select(to_date(col("l_shipdate")).as("ship_day"),
      col("l_extendedprice"))
    val stats = R.histStats(keyedQ, "l_extendedprice")
    val winQ = R.windowQuantileFromCells(
      R.dailyHistCells(keyedQ, "l_extendedprice", stats), stats, wide)
    val lastQ = winQ.filter(col("ship_day") === lastDay).collect()
      .map(r => r.getDouble(1) -> doubleToLongBits(r.getDouble(2))).toMap
    val globalQ = R.queries("b37_quantile_hist")(spark, SF).collect()
      .map(r => r.getDouble(0) -> doubleToLongBits(r.getDouble(1))).toMap
    Seq(0.5, 0.95).foreach { q =>
      assert(lastQ(q) === globalQ(q),
        s"all-span windowed q=$q must equal the global b37 estimate")
    }
  }

  test("B48 closure law: window >= span makes the last day the GLOBAL b38c set-ops exactly") {
    // the b45/b46 closure law for the KMV set-op window: at windowDays
    // >= the corpus span, the last day's trailing conditional minima
    // ARE the global ones (min over all days of per-day minima = the
    // one-shot min; a never-occupied bucket is NULL here and -1 in
    // b38c — both contribute zero to every sum and count), so all five
    // estimates must be bit-identical to the one-shot b38c row.
    import org.apache.spark.sql.functions.{max => fmax, to_date}
    import java.lang.Double.doubleToLongBits
    val R = graft.operators.Relational
    val li = graft.sources.Tables.table(spark, SF, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(to_date(col("l_shipdate")).as("ship_day"),
        col("l_returnflag").as("tag"), col("l_orderkey"))
    val win = R.windowKmvSetops(
      R.dailyKmvCells(li, "l_orderkey", "tag", "A", "R"), 1000000)
    val lastDay = win.agg(fmax(col("ship_day"))).head().getDate(0)
    val last = win.filter(col("ship_day") === lastDay).head()
    val global = R.queries("b38_kmv_setops")(spark, SF).head()
    (0 until 5).foreach { i =>
      assert(doubleToLongBits(last.getDouble(i + 1)) ===
        doubleToLongBits(global.getDouble(i)),
        s"all-span windowed KMV column $i must equal the global b38c estimate")
    }
  }

  test("C40 Holt-Winters laws: +7-day translation is bit-neutral; value doubling doubles every output exactly") {
    // the seasonal state is a linear map of the values with dyadic
    // coefficients, and slots are calendar-mod-7: shifting all dates
    // by exactly one period preserves every slot (so the whole state),
    // and doubling values doubles s/b/c exactly (power-of-two FP).
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val start = java.time.LocalDate.parse("2024-02-01")
    val rows = (0 to 24).filter(_ => rng.nextDouble() < 0.8).map { i =>
      (200L + i, 1L, start.plusDays(i).toString + " 08:00:00",
        (rng.nextInt(4000) + 1) / 4.0) // dyadic values
    }
    def run(shiftDays: Int, scale: Double) = {
      val ev = rows.map { case (id, u, ts, v) =>
        (id, u, java.time.LocalDate.parse(ts.take(10)).plusDays(shiftDays)
          .toString + " 08:00:00", v * scale)
      }.toDF("event_id", "user_id", "ts", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts")).as("ts"), col("value"),
          lit("purchase").as("event_type"))
      val r = Fraud.holtWintersForecast(ev).head()
      (r.getAs[Double]("level"), r.getAs[Double]("trend"),
        r.getAs[Double]("forecast"))
    }
    def bits(t: (Double, Double, Double)) =
      (java.lang.Double.doubleToLongBits(t._1),
        java.lang.Double.doubleToLongBits(t._2),
        java.lang.Double.doubleToLongBits(t._3))
    val base = run(0, 1.0)
    assert(bits(run(7, 1.0)) === bits(base),
      "+7 days preserves every slot, so the state must be bit-identical")
    val doubled = run(0, 2.0)
    assert(bits(doubled) === bits((base._1 * 2, base._2 * 2, base._3 * 2)),
      "doubling values must double level/trend/forecast exactly")
  }

  test("I25 bottom-k merge law: per-shard samples re-cut to EXACTLY the one-shot i12 sample at any shard count") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("hk"))).sortBy(_._1).toSeq
    val oneShot = rows(graft.operators.Profile.uniformSampleK(docs, k = 37))
    // the law, not one lucky partitioning: shards = 1 (degenerate),
    // the operator default 4, and a coprime 7
    for (shards <- Seq(1, 4, 7)) {
      val merged = rows(graft.operators.Profile.sampleMergeK(docs, k = 37,
        shards = shards))
      assert(merged === oneShot,
        s"shards=$shards: the merged bottom-k must equal the one-shot sample")
    }
  }

  test("I26 per-stratum merge law: sharded stratified samples re-cut to EXACTLY the one-shot i16 at any shard count") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("rnk"))).sortBy(x => (x._2, x._3)).toSeq
    val oneShot = rows(graft.operators.Profile.stratifiedK(docs, k = 13))
    for (shards <- Seq(1, 4, 7)) {
      val merged = rows(graft.operators.Profile.stratifiedMergeK(docs,
        k = 13, shards = shards))
      assert(merged === oneShot,
        s"shards=$shards: the per-stratum merge must equal the one-shot i16")
    }
  }
}
