package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

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
}
