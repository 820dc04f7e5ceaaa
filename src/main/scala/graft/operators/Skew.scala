package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Cols._

/** Skew mitigation for pathological key distributions.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * most runtime skew; this explicit salted join is the deterministic
  * fallback for keys so hot that even split partitions overwhelm a task
  * — e.g. a single merchant carrying 20% of 100 TB of transactions.
  */
object Skew {

  /** Inner/left equi-join where the big (fact) side's hot keys are
    * spread over `buckets` salt values and the small (dim) side is
    * replicated once per salt. Row-for-row equivalent to the plain join:
    * every fact row still meets exactly one copy of its dim row.
    *
    * `saltFrom` must be a deterministic expression over the BIG side's
    * columns (e.g. a line number or id) so results are reproducible —
    * not rand(), which would break retry idempotence on task failure.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // For right/full joins an unmatched small-side row would surface once
    // per salt replica — the equivalence contract only holds inner/left.
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer" || joinType == "leftouter",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedBig = big.withColumn("__graft_salt",
      pmod(xxhash64(saltFrom), lit(buckets.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig
      .join(replicatedSmall, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }

  /** The salting DECISION, as a pure function over measured data:
    * salt iff some single key carries more than `hotShare` of the fact
    * — the point where AQE's skew split stops helping (it splits
    * partitions, not one key's hash bucket) and the deterministic
    * salted plan earns its dim-replication overhead. Pure and
    * spec-pinned so the threshold semantics can't drift into the
    * plan-building code.
    */
  private[graft] def shouldSalt(maxHotRows: Long, totalRows: Long,
                                hotShare: Double = 0.05): Boolean =
    totalRows > 0 && maxHotRows.toDouble > hotShare * totalRows

  /** The b32-shaped bounded heavy-hitter table over a join key: the
    * single-pass freqItems sketch (fixed memory, no key shuffle — b32's
    * approx path) nominates ≤1/support candidates, and one filtered
    * pass counts exactly those (broadcast semi-join — the candidate set
    * is bounded by construction, so the count aggregate's key space is
    * too). At 100 TB this is the table a pipeline MAINTAINS per load
    * (b32/b35 already compute it for governance); the join planner
    * just reads it.
    */
  def hotKeyCounts(df: DataFrame, key: String,
                   support: Double = 0.001): DataFrame =
    df.join(broadcast(df.stat.freqItems(Seq(key), support)
        .select(explode(col(s"${key}_freqItems")).as(key))),
        Seq(key), "left_semi")
      .groupBy(col(key)).agg(count(lit(1)).as("n_rows"))

  /** Salting as DATA: compile salted-vs-plain from a maintained
    * heavy-hitter table instead of hard-coding the plan shape. The
    * driver reads the BOUNDED `hitters` relation (b32's output shape:
    * key, n_rows — ≤1/support rows) plus the fact's row count, decides
    * via [[shouldSalt]], and emits either the plain equi-join (no
    * dim-replication overhead when the corpus is uniform) or
    * [[saltedJoin]] (parallel hot key when it isn't). Both arms are
    * row-for-row equivalent, so the decision is oracle-neutral — the
    * spec flips the plan on an engineered skew corpus and pins equal
    * results either way.
    *
    * This is the c1-enrich production seam: key distributions drift
    * (yesterday's uniform merchant table grows a whale), and the
    * mitigation should follow the DATA at plan-build time, not a code
    * change. The decision inputs are one bounded-table max and a count
    * the load pipeline already tracks.
    *
    * EAGER at construction time (round-11 advice): deciding the plan
    * shape requires the decision inputs NOW, so this overload runs one
    * Spark job (`hitters.agg(max).head()`) before any caller collects
    * — and callers typically also pay a `totalRows` count and the
    * [[hotKeyCounts]] freqItems corpus pass to produce the arguments.
    * Merely CONSTRUCTING the join therefore triggers corpus passes —
    * surprising for an API that looks lazy. A pipeline that already
    * maintains the hot-key table (b32/b35 governance) should read the
    * two scalars from its last load's bookkeeping and call the
    * precomputed overload below, which builds the plan without running
    * any job.
    */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                         hitters: DataFrame, totalRows: Long,
                         saltFrom: Column, buckets: Int,
                         joinType: String = "inner",
                         hotShare: Double = 0.05): DataFrame = {
    val head = hitters.agg(max(col("n_rows"))).head()
    val maxHot = if (head.isNullAt(0)) 0L else head.getLong(0)
    adaptiveSaltedJoin(big, small, keys, maxHot, totalRows, saltFrom,
      buckets, joinType, hotShare)
  }

  /** [[adaptiveSaltedJoin]] from PRE-COMPUTED decision scalars — fully
    * lazy: no job runs until the caller executes the returned plan.
    * `maxHot` is the hottest key's row count (the max of the b32-shape
    * hitter table a load pipeline maintains anyway).
    */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                         maxHot: Long, totalRows: Long,
                         saltFrom: Column, buckets: Int,
                         joinType: String,
                         hotShare: Double): DataFrame =
    if (shouldSalt(maxHot, totalRows, hotShare))
      saltedJoin(big, small, keys, saltFrom, buckets, joinType)
    else big.join(small, keys, joinType)

  /** Synthetic hot-key fact for the skew study: 80% of transactions
    * remapped to one user — the "single merchant carries most of the
    * volume" pathology — then amplified `amp`× with an explode replica
    * index. The amplification stands in for scale: at sf0.1 the raw hot
    * key holds only ~480k cheap probe rows, so the straggler penalty
    * drowns in fixed costs and the study would measure nothing; at 8×
    * the hot reducer carries ~3.8M rows — still 25000× short of the
    * 100 TB pathology, but past the crossover where one task's work
    * visibly outweighs the salting overhead. Deterministic (modulo of
    * the order key, dense replica index), so plain and salted variants
    * are comparable AND both hash-match the same DuckDB oracle (counts
    * and sums scale exactly `amp`×).
    */
  private[operators] val amp = 8
  private def skewedTx(s: SparkSession, d: String): DataFrame =
    Fraud.transactions(s, d)
      .withColumn("user_id",
        when(pmod(col("tx_okey"), lit(5)) < 4, lit(1L)).otherwise(col("user_id")))
      .withColumn("__rep", explode(sequence(lit(0), lit(amp - 1))))

  /** Per-country spend over the skewed fact. `shuffle_hash`-hinted dim:
    * the demo models the regime where the user dim exceeds the broadcast
    * threshold (billions of users), because a broadcast join is immune to
    * key skew — there'd be nothing to measure.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Plain shuffle join: every hot-key row lands in ONE reducer
    // partition — the task that never finishes at 100 TB. (AQE's skew
    // split only engages past its 256 MB partition threshold, and it
    // splits the build-side scan, not the single hot key.)
    "c1_skew_plain" -> ((s, d) =>
      skewedTx(s, d)
        .join(Fraud.users(s, d).hint("shuffle_hash"), Seq("user_id"), "left")
        .groupBy(col("user_country"))
        .agg(count(lit(1)).as("n_tx"), dsum2(col("amount")).as("total_amount"))),

    // Salted: the hot key is spread over 16 salt buckets (deterministic
    // salt from the row's own keys), the dim replicated once per salt —
    // row-for-row equivalent, and the hot key's work is parallel again.
    "c1_skew_salted" -> ((s, d) =>
      saltedJoin(skewedTx(s, d), Fraud.users(s, d).hint("shuffle_hash"),
          Seq("user_id"),
          // (okey, lineno 1..7, rep 0..7) pack densely -> replicas of one
          // source row land in DIFFERENT salt buckets, which is the point
          saltFrom = col("tx_okey") * 64 + col("tx_lineno") * 8 + col("__rep"),
          buckets = 16, joinType = "left")
        .groupBy(col("user_country"))
        .agg(count(lit(1)).as("n_tx"), dsum2(col("amount")).as("total_amount"))),

    // Auto: the DATA decides. The driver reads the b32-shaped bounded
    // heavy-hitter table + the fact count, and compiles the salted plan
    // only because this corpus is engineered hot (SkewSpec proves the
    // uniform corpus compiles the plain join from the same code path).
    "c1_skew_auto" -> ((s, d) => {
      val tx = skewedTx(s, d)
      adaptiveSaltedJoin(tx, Fraud.users(s, d).hint("shuffle_hash"),
          Seq("user_id"),
          hitters = hotKeyCounts(tx, "user_id"), totalRows = tx.count(),
          saltFrom = col("tx_okey") * 64 + col("tx_lineno") * 8 + col("__rep"),
          buckets = 16, joinType = "left")
        .groupBy(col("user_country"))
        .agg(count(lit(1)).as("n_tx"), dsum2(col("amount")).as("total_amount"))
    })
  )

  /** Both variants hash-match the SAME oracle — the equivalence claim of
    * [[saltedJoin]] checked end-to-end, not just in SkewSpec.
    */
  def oracles: Map[String, String] = {
    val sql =
      s"""SELECT un.n_name AS user_country, count(*) * $amp AS n_tx,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * $amp AS DOUBLE) AS total_amount
        |FROM (SELECT CASE WHEN l_orderkey % 5 < 4 THEN 1 ELSE o_custkey END AS user_id,
        |             l_extendedprice
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey) tx
        |LEFT JOIN customer ON tx.user_id = c_custkey
        |LEFT JOIN nation un ON c_nationkey = un.n_nationkey
        |GROUP BY un.n_name""".stripMargin
    Map("c1_skew_plain" -> sql, "c1_skew_salted" -> sql,
      "c1_skew_auto" -> sql)
  }
}
