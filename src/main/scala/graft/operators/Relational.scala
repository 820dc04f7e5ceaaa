package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols._
import graft.sources.Tables

/** Relational core — the reference's batch-relational capabilities
  * (projection/filter, joins of every flavor, aggregation, time windows,
  * analytic windows, dedup, rollup, upsert) expressed as declarative
  * DataFrame plans so Catalyst owns pushdown, join strategy selection and
  * partial (map-side) aggregation.
  *
  * Reference semantics: src/spark/jobs/spark.py (joins/aggregates/windows),
  * src/snowflake (MERGE, incremental load), src/airflow/script
  * (partition recovery, trend queries).
  *
  * Scale notes are per-query, in comments.
  */
object Relational {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.table(s, d, name)

  /** Count-min-sketch parameters (B35 family): depth hash rows × 2^17
    * integer cells — 4 MB fixed, independent of key cardinality.
    */
  private val cmsW = 1L << 17
  private val cmsDepth = 4

  private val cmsP = 2147483647L // 2^31 - 1, same prime as the MinHash family

  /** All `depth` engine-portable CMS buckets from ONE md5 of the key:
    * base hash h = md5Prefix60(key) mod P, then the affine row family
    * h_r = ((a_r·h + b_r) mod P) mod w — the SAME pairwise-independent
    * construction (and constants) as Dedup.minhashes, already proven
    * portable by the d2 oracle. One digest per row instead of depth
    * digests: the md5 is the dominant per-row cost of the sketch (the
    * naive per-(r,key) hashing measured 4.6 s vs ~1.5 s at sf0.1).
    * a·h < 2^62, safely inside a signed long under ANSI.
    */
  private def cmsBucketArray(h: Column): Column =
    transform(sequence(lit(0), lit(cmsDepth - 1)), r => {
      val a = (r.cast("long") * lit(2654435761L) + lit(1L)) % cmsP
      val b = r.cast("long") * lit(40503L) + lit(17L)
      ((a * h + b) % cmsP) % cmsW
    })

  private def cmsKeyHash(key: Column): Column =
    graft.functions.HashFunctions.md5Prefix60(key.cast("string")) % cmsP

  /** One-shot CMS cell table over `keyed(keyCol)`: one digest + depth
    * affine buckets per row map-side, partial aggregation collapses
    * each partition to ≤ depth×w cells before the exchange.
    * `private[graft]`: the streaming sketch maintenance (H12) builds
    * each micro-batch's cells with exactly this function, which is what
    * makes stream ≡ batch bit-exact.
    */
  private[graft] def cmsCells(keyed: DataFrame, keyCol: String): DataFrame =
    keyed
      .select(cmsKeyHash(col(keyCol)).as("h"))
      .select(posexplode(cmsBucketArray(col("h"))).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimate every distinct key against a (possibly merged) cell table
    * — min over the depth rows — and keep keys at/above `threshold`.
    * The cell table broadcasts (4 MB). The join is LEFT with a 0
    * fallback: a cell with no row in the table has count 0, and a
    * candidate key absent from the sketched data must estimate 0 from
    * its empty cells, not survive on a single collision-inflated one
    * (indistinguishable for b35's keyed ⊆ sketched case — a present
    * key's own increments populate all its cells — but load-bearing
    * when H12 serves a candidate set wider than the stream's keys).
    */
  private[graft] def cmsThresholdEstimate(keyed: DataFrame, cells: DataFrame,
                                          keyCol: String, threshold: Long): DataFrame =
    keyed.distinct()
      .select(col(keyCol), cmsKeyHash(col(keyCol)).as("h"))
      .select(col(keyCol), posexplode(cmsBucketArray(col("h"))).as(Seq("r", "bucket")))
      .join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
      .filter(col("est_count") >= threshold)

  /** HyperLogLog parameters (B36 family): 2^8 registers, each holding
    * max leading-zero rank over the remaining 52 hash bits — 256 small
    * integers, independent of key cardinality. Like B35 this is the
    * ENGINE-PORTABLE form of the sketch: register index and rank derive
    * from md5Prefix60 by mask/shift, register state is integer, and the
    * estimator uses only IEEE-correctly-rounded float ops (+ - * /), so
    * DuckDB reproduces the ESTIMATE bit-for-bit. That upgrades the
    * merge-equivalence b28's builtin HLL can only rows-check into an
    * exact shared-oracle hash check (the same promotion B35 made for
    * frequency sketches).
    */
  private val hllM = 256L
  private val hllEmptyTerm = 9007199254740992L // 2^53 = the rho=0 term, scaled

  /** (bucket, rho) per row: bucket = low 8 bits of the 60-bit portable
    * hash; rho = 1 + leading zeros of the remaining 52 bits
    * = 53 - bitlength(h >> 8). The DuckDB oracle evaluates bitlength as
    * `length(ltrim(bin(w), '0'))`; Spark runs the value-identical native
    * [[graft.functions.HllRho52]] (clz64 − 11: one intrinsic inside
    * whole-stage codegen, no per-row binary-string rendering — equality
    * property-spec'd over random longs including 0 and negatives).
    * `carry` threads grouping columns (the merge variant's slice).
    */
  private def hllObservations(keyed: DataFrame, keyCol: String,
                              carry: Seq[String] = Nil): DataFrame =
    keyed
      .select(carry.map(col) :+
        graft.functions.HashFunctions.md5Prefix60(col(keyCol).cast("string")).as("h"): _*)
      .select(carry.map(col) :+
        col("h").bitwiseAND(lit(hllM - 1)).as("bucket") :+
        graft.functions.HashFunctions.hllRho52(shiftright(col("h"), 8)).as("rho"): _*)

  /** Raw HLL estimate from a register table (bucket, r). The indicator
    * sum Σ 2^-r is computed as the EXACT integer Σ 2^(53-r) (≤ 2^61, no
    * float-order concern at all); empty registers contribute 2^53 each.
    * alpha_m · m² · 2^53 / S then runs on reproducible doubles. Raw
    * range only (no linear-counting branch): callers keep m small enough
    * that NDV ≥ 2.5·m, which avoids ln() — the one non-portable float op.
    */
  private def hllEstimate(registers: DataFrame,
                          groupCols: Seq[String] = Nil): DataFrame = {
    val partial = Seq(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - r)")).as("s_present"),
      count(lit(1)).as("registers_set"))
    val agged =
      if (groupCols.isEmpty) registers.agg(partial.head, partial.tail: _*)
      else registers.groupBy(groupCols.map(col): _*).agg(partial.head, partial.tail: _*)
    agged.select(groupCols.map(col) :+
      (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
        * lit(9007199254740992.0)
        / (col("s_present")
            + (lit(hllM) - col("registers_set")) * lit(hllEmptyTerm)).cast("double"))
        .as("est_ndv") :+
      col("registers_set"): _*)
  }

  /** KMV / MinCount distinct sketch (B38 family): 2^8 buckets, each
    * holding the MINIMUM of the remaining 52 hash bits — the
    * order-statistic cousin of B36's rank-max registers, and the sketch
    * that buys SET OPERATIONS: bucket-wise min of two sketches IS the
    * sketch of the union (min is associative/commutative/idempotent →
    * the merge twin hash-matches the one-shot oracle exactly, like
    * b35/b36/b37), and |A∩B| follows by inclusion-exclusion on three
    * reproducible estimates. The estimator is the harmonic form
    *   n̂ = 2^68 / Σᵢ(vᵢ+1) − k          (empty bucket ⇒ term 2^52)
    * whose sum is an INTEGER (≤ 2^60 — exact, order-free; the b36
    * Σ 2^(53-r) trick again), followed by one correctly-rounded
    * division — engine-portable with no fold-order ceremony. (The
    * textbook Σ 1/uᵢ estimator was prototyped and REJECTED: E[1/U₍₁₎]
    * diverges, and it measured 24× over on real data; the harmonic
    * form measured +2.7% at sf0.01 / −5.4% at sf0.1 against exact NDV,
    * consistent with the 1/√k ≈ 6% theory for k = 256.)
    * Scale story: identical plan to b36 — partial min per partition
    * before the exchange, ≤ 256 rows on the wire at any cardinality.
    */
  private val kmvK = 256L
  private val kmvM = 4503599627370496L // 2^52: the empty-bucket term
  private val kmvK2M = 2.95147905179352825856e20 // 2^68 exactly (k²·2^52)

  /** (bucket, v) per row: bucket = low 8 bits of the portable 60-bit
    * hash, v = the remaining 52 bits. `carry` threads grouping columns
    * (the merge variant's slice, the set-op variant's tag).
    */
  private def kmvObservations(keyed: DataFrame, keyCol: String,
                              carry: Seq[String] = Nil): DataFrame =
    keyed
      .select(carry.map(col) :+
        graft.functions.HashFunctions.md5Prefix60(col(keyCol).cast("string")).as("h"): _*)
      .select(carry.map(col) :+
        col("h").bitwiseAND(lit(kmvK - 1)).as("bucket") :+
        shiftright(col("h"), 8).as("v"): _*)

  /** Estimate from a (bucket, v) minima table: integer sum + one
    * division (see family note above).
    */
  private def kmvEstimate(minima: DataFrame): DataFrame =
    minima
      .agg(sum(col("v") + lit(1L)).as("s_occ"), count(lit(1)).as("buckets_set"))
      .select(
        (lit(kmvK2M)
          / (col("s_occ") + (lit(kmvK) - col("buckets_set")) * lit(kmvM)).cast("double")
          - lit(256.0)).as("est_ndv"),
        col("buckets_set"))

  /** The scalar estimator over conditional sums — the set-op variant
    * computes three of these from ONE minima table.
    */
  private def kmvEst(s: Column, cnt: Column): Column =
    lit(kmvK2M) / (s + (lit(kmvK) - cnt) * lit(kmvM)).cast("double") - lit(256.0)

  /** Equi-width histogram quantile sketch (B37 family): a fixed-size
    * (64-cell) mergeable histogram over a one-pass global [lo, hi], with
    * linear interpolation inside the crossing cell — the exactly-
    * verifiable cousin of t-digest/approx_percentile. Counts are
    * integers (merge = cell-wise add, exact), interpolation is plain
    * IEEE arithmetic, so both the one-shot and merged forms hash-match
    * ONE DuckDB oracle. Error is bounded a priori by one cell width.
    */
  private val histNb = 64

  /** Cell index for value v against the broadcast stats row (lo, hi):
    * floor((v-lo)/step), top edge clamped into the last cell. A
    * degenerate range (hi = lo: constant column, or a single-row slice)
    * would make the division 0/0 = NaN and ANSI's NaN→long cast throw —
    * everything lands in cell 0 instead (the trivial histogram). The
    * guard never fires on the oracle'd tables, so the SQL twin stays
    * unconditional.
    */
  private def histBucket(v: Column): Column =
    when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(
        floor((v - col("lo")) / ((col("hi") - col("lo")) / lit(64.0))).cast("long"),
        lit(histNb - 1L)))

  /** The stats pass behind b37, MATERIALIZED ONCE: min/max/count collect
    * to the driver (one row — the bounded-model-state pattern the
    * similarity stack already uses) and come back as a literal 1-row
    * relation, so the two consumers (bucket projection + quantile
    * estimate) reference constants instead of each re-running a full
    * column scan — the round-4 advice finding. Doubles round-trip
    * bit-exactly through the JVM, so the oracle is unaffected. The agg
    * itself is parquet-footer-servable at 100 TB (min/max/count
    * statistics), which is why ONE evaluation is the right cost model.
    */
  private[graft] def histStats(df: DataFrame, valueCol: String): DataFrame = {
    val row = df.agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
      count(lit(1)).as("n")).head()
    if (row.isNullAt(0)) // empty input: trivial stats, no NaN/ANSI throw
      df.sparkSession.range(1).select(lit(0.0).as("lo"), lit(0.0).as("hi"),
        lit(0L).as("n"))
    else
      df.sparkSession.range(1).select(lit(row.getDouble(0)).as("lo"),
        lit(row.getDouble(1)).as("hi"), lit(row.getLong(2)).as("n"))
  }

  /** Interpolated quantile estimates from merged cells (bucket, cnt) and
    * the stats row (lo, hi, n). Everything after the histogram is ≤ 64
    * rows: the running-total window and the per-quantile first-crossing
    * rank cost the same at any corpus size — the sketch IS the scale
    * story.
    */
  private def histQuantileEstimate(cells: DataFrame, stats: DataFrame,
                                   qs: Seq[Double]): DataFrame = {
    val quantiles = cells.sparkSession.range(1)
      .select(explode(array(qs.map(lit(_)): _*)).as("quantile"))
    cells
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bucket"))))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(quantiles))
      .filter(col("cum").cast("double") >= col("quantile") * col("n").cast("double"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("quantile")).orderBy(col("bucket"))))
      .filter(col("rn") === 1)
      .select(col("quantile"),
        (col("lo") + (col("hi") - col("lo")) / lit(64.0) *
          (col("bucket").cast("double") +
            (col("quantile") * col("n").cast("double")
              - (col("cum") - col("cnt")).cast("double")) / col("cnt").cast("double")))
          .as("est_value"))
  }

  /** B46 shared: per-day histogram cells over `keyed` (ship_day,
    * valueCol) against the GLOBAL [lo, hi] stats grid — grid sharing
    * is what makes cells mergeable across days (b37_hist_merge's
    * cell-wise integer addition along the time axis).
    */
  def dailyHistCells(keyed: DataFrame, valueCol: String,
                     stats: DataFrame): DataFrame =
    keyed.crossJoin(stats)
      .select(col("ship_day"), histBucket(col(valueCol)).as("bucket"))
      .groupBy(col("ship_day"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** B46 shared close: trailing-`windowDays` interpolated quantiles
    * per day from daily histogram cells. Checkpoint-first for the same
    * reason as [[windowHllFromCells]]; the trailing union is a
    * per-bucket RANGE-window integer sum, the per-day total/crossing/
    * interpolation are b37's close keyed by ship_day with n coming
    * from the window total instead of a stats join.
    */
  def windowQuantileFromCells(rawCells: DataFrame, stats: DataFrame,
                              windowDays: Int = 60,
                              qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val s = rawCells.sparkSession
    val cells = Stage.checkpointFresh(rawCells)
    val days = cells.select(col("ship_day")).distinct()
      .select(col("ship_day"),
        datediff(col("ship_day"), lit("1970-01-01")).as("day_num"))
    val buckets = s.range(0, histNb).select(col("id").as("bucket"))
    val trail = Window.partitionBy(col("bucket")).orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1), 0)
    val wcells = days.crossJoin(buckets)
      .join(cells, Seq("ship_day", "bucket"), "left")
      .select(col("ship_day"), col("day_num"), col("bucket"),
        sum(col("cnt")).over(trail).as("wcnt"))
      .filter(col("wcnt").isNotNull)
    val quantiles = s.range(1).select(
      explode(array(qs.map(lit(_)): _*)).as("quantile"))
    wcells
      .withColumn("n", sum(col("wcnt")).over(
        Window.partitionBy(col("ship_day"))))
      .withColumn("cum", sum(col("wcnt")).over(
        Window.partitionBy(col("ship_day")).orderBy(col("bucket"))))
      .crossJoin(broadcast(quantiles))
      .filter(col("cum").cast("double") >= col("quantile") * col("n").cast("double"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ship_day"), col("quantile"))
          .orderBy(col("bucket"))))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(stats.select(col("lo"), col("hi"))))
      .select(col("ship_day"), col("quantile"),
        (col("lo") + (col("hi") - col("lo")) / lit(64.0) *
          (col("bucket").cast("double") +
            (col("quantile") * col("n").cast("double")
              - (col("cum") - col("wcnt")).cast("double")) / col("wcnt").cast("double")))
          .as("est_value"))
  }

  /** B45/B47 shared oracle: the windowed-HLL SQL (a def — composed
    * verbatim by the b47 error harness).
    */
  private def windowHllOracleSql: String =
    """WITH hk AS (
      |  SELECT CAST(l_shipdate AS DATE) AS ship_day,
      |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem),
      |cells AS (
      |  SELECT ship_day, h & 255 AS bucket,
      |         max(53 - length(ltrim(bin(h >> 8), '0'))) AS rho
      |  FROM hk GROUP BY 1, 2),
      |days AS (
      |  SELECT DISTINCT ship_day,
      |         date_diff('day', DATE '1970-01-01', ship_day) AS day_num
      |  FROM cells),
      |regs AS (SELECT range AS bucket FROM range(0, 256)),
      |dense AS (
      |  SELECT d.ship_day, d.day_num, r.bucket, c.rho
      |  FROM days d CROSS JOIN regs r
      |  LEFT JOIN cells c ON c.ship_day = d.ship_day AND c.bucket = r.bucket),
      |w AS (
      |  SELECT ship_day, bucket,
      |         max(rho) OVER (PARTITION BY bucket ORDER BY day_num
      |                        RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS r
      |  FROM dense),
      |s AS (
      |  SELECT ship_day,
      |         sum(CAST(1 AS BIGINT) << (53 - r)) AS s_present,
      |         count(*) AS registers_set
      |  FROM w WHERE r IS NOT NULL GROUP BY 1)
      |SELECT ship_day,
      |       CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
      |       * CAST(65536 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE)
      |       / CAST(s_present + (256 - registers_set) * CAST(9007199254740992 AS BIGINT) AS DOUBLE)
      |         AS est_ndv,
      |       registers_set
      |FROM s""".stripMargin

  /** B45/H33 shared: per-day HLL register cells over `keyed`
    * (ship_day, keyCol). Register-wise max is associative, commutative
    * AND idempotent, so daily cells merge across any slicing — loads,
    * micro-batches, replays — into the same table; H33 leans on the
    * idempotence specifically (a replayed batch double-landing its
    * cells cannot change a max).
    */
  def dailyHllCells(keyed: DataFrame, keyCol: String): DataFrame =
    hllObservations(keyed, keyCol, Seq("ship_day"))
      .groupBy(col("ship_day"), col("bucket")).agg(max(col("rho")).as("rho"))

  /** B45/H33 shared close: trailing-`windowDays` distinct-count
    * estimates per day from daily register cells. The cell table is
    * eagerly checkpointed FIRST (the i23 idiom): the days branch
    * selects fewer columns than the register frame, so without the cut
    * the pruned distinct canonicalizes differently and RE-SCANS the
    * upstream (observed as 2 finalized corpus scans in the first b45
    * build). Everything after operates on the ≤ days×256-row frame:
    * the trailing union is a per-register RANGE-window max (the
    * b36_hll_merge law along the time axis), closed by the shared
    * [[hllEstimate]].
    */
  def windowHllFromCells(rawCells: DataFrame, windowDays: Int = 60): DataFrame = {
    val s = rawCells.sparkSession
    val cells = Stage.checkpointFresh(rawCells)
    val days = cells.select(col("ship_day")).distinct()
      .select(col("ship_day"),
        datediff(col("ship_day"), lit("1970-01-01")).as("day_num"))
    val registers = s.range(0, hllM).select(col("id").as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1), 0)
    val merged = days.crossJoin(registers)
      .join(cells, Seq("ship_day", "bucket"), "left")
      .select(col("ship_day"), col("day_num"), col("bucket"),
        max(col("rho")).over(w).as("r"))
      .filter(col("r").isNotNull)
      .select(col("ship_day"), col("bucket"), col("r"))
    hllEstimate(merged, Seq("ship_day"))
  }

  /** B48 cells: per-day CONDITIONAL KMV minima for two tagged slices —
    * b38c's (va, vb) conditional-minima table grouped by ship_day.
    * Absent slice-in-bucket-on-day is NULL here (not b38c's −1
    * sentinel): the trailing RANGE-window MIN must IGNORE absent days,
    * which SQL min-over-window does for NULL and would not for −1.
    * ≤ days×256 rows however many keys ship — the h33/b45 state bound.
    */
  def dailyKmvCells(keyed: DataFrame, keyCol: String, tagCol: String,
                    tagA: String, tagB: String): DataFrame =
    kmvObservations(keyed, keyCol, Seq("ship_day", tagCol))
      .groupBy(col("ship_day"), col("bucket"))
      .agg(min(when(col(tagCol) === tagA, col("v"))).as("va"),
        min(when(col(tagCol) === tagB, col("v"))).as("vb"))

  /** B48 close: trailing-`windowDays` KMV SET OPERATIONS per day —
    * |A|, |B|, |A∪B|, |A∩B| and Jaccard between two slices' trailing
    * windows, the b38c algebra keyed by ship_day. Bucket-wise MIN is
    * associative/commutative/idempotent, so the per-register RANGE
    * window over the daily cells IS the trailing union sketch (the
    * b36_hll_merge/b45 law applied to KMV), the union of the two
    * slices is the row-local null-guarded min of the two windowed
    * minima, and everything downstream of the eager cell checkpoint
    * runs on the dense days×256 frame — the corpus is scanned once,
    * inside the checkpoint (PlanSpec pins zero finalized parquet
    * scans). The governance question this answers online at 100 TB:
    * "how much does this week's corpus overlap last week's slice"
    * per day, with 256 integers of state per day and no distinct key
    * ever shuffled. The null-min is spelled as an explicit CASE on
    * both engines (never least(): NULL-handling of least is
    * engine-defined); sums are exact integers (≤ 2^60), the estimator
    * one correctly-rounded division — fully oracle-able.
    */
  def windowKmvSetops(rawCells: DataFrame, windowDays: Int = 60): DataFrame = {
    val s = rawCells.sparkSession
    val cells = Stage.checkpointFresh(rawCells)
    val days = cells.select(col("ship_day")).distinct()
      .select(col("ship_day"),
        datediff(col("ship_day"), lit("1970-01-01")).as("day_num"))
    val buckets = s.range(0, kmvK).select(col("id").as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1), 0)
    days.crossJoin(buckets)
      .join(cells, Seq("ship_day", "bucket"), "left")
      .select(col("ship_day"), col("day_num"), col("bucket"),
        min(col("va")).over(w).as("wa"),
        min(col("vb")).over(w).as("wb"))
      .select(col("ship_day"), col("wa"), col("wb"),
        when(col("wa").isNull, col("wb"))
          .when(col("wb").isNull, col("wa"))
          .when(col("wa") < col("wb"), col("wa"))
          .otherwise(col("wb")).as("wu"))
      .groupBy(col("ship_day")).agg(
        sum(when(col("wa").isNull, lit(0L)).otherwise(col("wa") + lit(1L))).as("sa"),
        sum(when(col("wa").isNull, lit(0L)).otherwise(lit(1L))).as("ca"),
        sum(when(col("wb").isNull, lit(0L)).otherwise(col("wb") + lit(1L))).as("sb"),
        sum(when(col("wb").isNull, lit(0L)).otherwise(lit(1L))).as("cb"),
        sum(when(col("wu").isNull, lit(0L)).otherwise(col("wu") + lit(1L))).as("su"),
        sum(when(col("wu").isNull, lit(0L)).otherwise(lit(1L))).as("cu"))
      .select(col("ship_day"),
        kmvEst(col("sa"), col("ca")).as("est_a"),
        kmvEst(col("sb"), col("cb")).as("est_b"),
        kmvEst(col("su"), col("cu")).as("est_union"))
      .select(col("ship_day"), col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        ((col("est_a") + col("est_b") - col("est_union")) / col("est_union"))
          .as("jaccard_est"))
  }

  /** B49 cells: per ship_day, the k smallest (hk, key) fact rows — a
    * daily bottom-k sample sketch (i25's mergeable summary keyed by
    * day). hk is the salted md5 rank ("wsamp:" — every sampler salts
    * its own hash, the i8/i10/i12 rule), so the cells are
    * deterministic and engine-portable. One ship_day exchange; the
    * per-partition rank prunes to k rows pre-shuffle via
    * WindowGroupLimit. State: ≤ days×k rows however large the fact.
    * At extreme scale the per-day reducer still receives ≤ tasks×k
    * rows (WindowGroupLimit's residue); if that binds, set
    * `preCutSalts` > 0: a salted pre-cut level ranks within
    * (day, salt) and keeps k BEFORE the day cut — the bottom-k law
    * composes (i25's shard merge: bottom-k of per-salt bottom-k's IS
    * the true bottom-k), so the output is bit-identical and
    * RelationalSpec pins that, while the day reducer's input shrinks
    * to ≤ salts×k rows per day.
    */
  def dailySampleCells(keyed: DataFrame, k: Int = 100,
                       preCutSalts: Int = 0): DataFrame = {
    val h = graft.functions.HashFunctions
      .md5Prefix60(concat(lit("wsamp:"), col("key")))
    val hashed = keyed.select(col("ship_day"), col("key"), h.as("hk"))
    val preCut =
      if (preCutSalts <= 0) hashed
      else {
        val wp = Window
          .partitionBy(col("ship_day"), col("salt"))
          .orderBy(col("hk"), col("key"))
        hashed
          .withColumn("salt",
            pmod(xxhash64(col("key")), lit(preCutSalts.toLong)))
          .withColumn("prk", row_number().over(wp))
          .filter(col("prk") <= k)
          .select(col("ship_day"), col("key"), col("hk"))
      }
    val w = Window.partitionBy(col("ship_day")).orderBy(col("hk"), col("key"))
    preCut
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("ship_day"),
        datediff(col("ship_day"), lit("1970-01-01")).as("day_num"),
        col("key"), col("hk"))
  }

  /** B49 close: the trailing-`windowDays` UNIFORM SAMPLE per day —
    * "a fresh unbiased k-row sample of the last 60 days' rows, every
    * day" (the daily-eval / drift-inspection shape), completing the
    * sketch×window matrix: b45 HLL∪, b46 histogram, b48 KMV set-ops,
    * this = bottom-k. The law (i25's, along the time axis): the k
    * smallest of a union are each smallest within their own day, so
    * bottom-k(trailing window) = re-cut of the union of daily
    * bottom-k cells — the window never touches the fact again.
    *
    * Unlike b45/b48 the merge is a RE-CUT, not a per-register fold,
    * so the trailing union is spelled as a bounded expansion: each
    * cell row serves its next `windowDays` days (cells×60 rows — ≤
    * days×k×60 REGARDLESS of fact size; the b47 exact-side shape,
    * but over k-bounded cells instead of the raw fact), equi-joined
    * to the real-day list, then one rank per serve-day re-cuts to k.
    * Everything downstream of the eager cell checkpoint runs on that
    * bounded frame — the corpus is scanned once, inside the
    * checkpoint. Fully oracle-able: md5 ranks, integer day windows,
    * deterministic (hk, key) total order.
    */
  def windowSample(rawCells: DataFrame, windowDays: Int = 60,
                   k: Int = 100): DataFrame = {
    val cells = Stage.checkpointFresh(rawCells)
    val days = cells.select(col("ship_day"), col("day_num")).distinct()
    val expanded = cells
      .select(col("key"), col("hk"),
        explode(sequence(col("day_num"),
          col("day_num") + lit(windowDays - 1))).as("day_num"))
      .join(broadcast(days), Seq("day_num"))
    val w = Window.partitionBy(col("ship_day")).orderBy(col("hk"), col("key"))
    expanded
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("ship_day"), col("rk").cast("long").as("rk"),
        col("key"), col("hk"))
  }

  /** B50 cells: per ship_day, the top-`m` keys by exact count — the
    * daily space-saving-style summary the windowed heavy-hitter merge
    * reads. One (day, key) aggregate is the corpus pass; the per-day
    * cut is deterministic ((count desc, key) total order) and prunes
    * per-partition via WindowGroupLimit. State: ≤ days×m rows.
    * Sized against the corpus before building (§6b): per-day key
    * cardinality maxes at 253 at sf0.1 (8 at sf0.001), so at every
    * verify scale the m=256 cells are COMPLETE — no truncation — and
    * the windowed counts are exact; past ~2× that scale the cut
    * engages and estimates become one-sided UNDER-counts (a key's
    * absent-day counts are lost), the standard mergeable-summary
    * trade, mirrored to b35's one-sided over-count.
    */
  def dailyTopCells(keyed: DataFrame, m: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("ship_day"))
      .orderBy(col("c").desc, col("key"))
    keyed
      .groupBy(col("ship_day"), col("key")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
      .select(col("ship_day"),
        datediff(col("ship_day"), lit("1970-01-01")).as("day_num"),
        col("key"), col("c"))
  }

  /** B50 close: trailing-`windowDays` TOP-K heavy hitters per day —
    * "which keys are trending over the last 60 days, every day" (the
    * governance twin of b32/b35 along the time axis; the FREQUENCY
    * cell of the sketch×window matrix beside b45 HLL∪, b46 histogram,
    * b48 KMV set-ops and b49 bottom-k sample). Counts are additive,
    * so the trailing count is the sum of a key's daily cells in the
    * window — spelled as the b49 bounded expansion (each cell serves
    * its next 60 days: ≤ days×m×60 rows regardless of fact size),
    * one (serve_day, key) integer sum, and a per-day rank re-cut to
    * k. Everything downstream of the eager cell checkpoint runs on
    * the bounded frame; integer sums and the (count desc, key) total
    * order make it fully oracle-able.
    */
  def windowTopK(rawCells: DataFrame, windowDays: Int = 60,
                 k: Int = 10): DataFrame = {
    val cells = Stage.checkpointFresh(rawCells)
    val days = cells.select(col("ship_day"), col("day_num")).distinct()
    // Counts are ADDITIVE, so when the key universe is compact the
    // trailing sum has a 60×-lighter exact form than the serve-day
    // expansion (r15, guide §2.3 — shuffle fewer bytes): a dense
    // (real day × key-ever-in-cells) grid left-joined to the cells
    // with a per-key integer RANGE window over day_num replaces the
    // cells×windowDays explode+re-aggregate (measured at sf0.1:
    // 34.5M expanded rows → a 580k-row frame, 5.7 s → 4.0 s,
    // result-identical by construction — exact integer sums either
    // way, same (count desc, key) cut; w_count > 0 keeps zero-count
    // grid rows out of the rank, matching the expansion's row set).
    // The grid is days×|keys| rows, and a grid row costs MORE than an
    // expanded row (two sort-based window passes vs one codegen
    // explode + a map-side-combinable hash aggregate) — so the branch
    // gates on the measured grid/cells ratio, not on grid vs the 60×
    // expansion (that first gate mis-picked grid at sf1: 28.1 s vs
    // 10.6 s expansion, a 2.7× regression invisible at sf0.1). The
    // two measured anchor points on this corpus: ratio 4.7 at sf0.1
    // (1,000 suppkeys; grid 2.5M rows vs 533k cells) — grid WINS
    // 5.7→4.0 s; ratio 39 at sf1 (10,000 suppkeys, cells capped by
    // the m=256 daily cut) — grid LOSES 2.7×. The factor-8 cut sits
    // between them with margin against the known-bad point; both
    // branches are exact integer sums over the same cells
    // (PropertySpec forces each), so the gate is a pure cost choice.
    val nCells = cells.count()
    val nDays = days.count()
    val nKeys = cells.select(col("key")).distinct().count()
    val sums =
      if (nDays * nKeys <= nCells * 8L) {
        val grid = days.crossJoin(cells.select(col("key")).distinct())
        val wr = Window.partitionBy(col("key")).orderBy(col("day_num"))
          .rangeBetween(-(windowDays - 1), 0)
        grid
          .join(cells.select(col("day_num"), col("key"), col("c")),
            Seq("day_num", "key"), "left")
          .na.fill(0L, Seq("c"))
          .select(col("ship_day"), col("key"),
            sum(col("c")).over(wr).as("w_count"))
          .filter(col("w_count") > 0)
      } else {
        val expanded = cells
          .select(col("key"), col("c"),
            explode(sequence(col("day_num"),
              col("day_num") + lit(windowDays - 1))).as("day_num"))
          .join(broadcast(days), Seq("day_num"))
        expanded.groupBy(col("ship_day"), col("key"))
          .agg(sum(col("c")).as("w_count"))
      }
    val w = Window.partitionBy(col("ship_day"))
      .orderBy(col("w_count").desc, col("key"))
    sums
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("ship_day"), col("rk").cast("long").as("rk"),
        col("key"), col("w_count"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3: JSON field extraction from raw event payloads
    // (reference: producer emits JSON transactions; consumer parses —
    // src/kafka/producer/transaction_producer.py).
    // Scales: per-row expression, no shuffle; filter pushed past the scan.
    "a3_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_val"))
        .filter(col("k_val") >= 50)),

    // B1: projection + filter with parquet pushdown. `.explain` shows
    // PushedFilters on l_shipdate/l_discount and a 4-column ReadSchema.
    "b1_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    // B3a: inner join + aggregate. Shuffle on the join key only; partial
    // aggregation map-side. At 100 TB AQE picks shuffle-hash/sort-merge.
    "b3_join_inner" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_value"))
    }),

    // B3b: left semi — EXISTS semantics without materializing the right side.
    "b3_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // B3c: left anti — NOT EXISTS.
    "b3_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // B3d: broadcast dimension join — the 100 TB fact side never shuffles;
    // `part` ships to every executor. Explicit broadcast() hint.
    "b3_join_broadcast" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val p = t(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_extendedprice")).as("revenue"))
    }),

    // B5: groupBy aggregate battery (sum/count/avg/min/max). Decimal sums
    // are order-independent → identical on any cluster size.
    "b5_agg_basic" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_price"),
          (dsum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))),

    // B6 exact twin: exact distinct (expands to two-phase aggregate).
    "b6_count_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_users"),
             count(lit(1)).as("n_orders"))),

    // B6: approx_count_distinct (HLL++) — what the reference actually uses
    // (src/spark/jobs/spark.py approx_count_distinct) and what survives
    // 100 TB: fixed-size sketch, single aggregation pass, no distinct
    // shuffle explosion. Rows-only check (sketch internals are
    // engine-specific, no SQL oracle).
    "b6_approx_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey")).as("approx_users"),
             count(lit(1)).as("n_orders"))),

    // B8: sliding event-time window (10 min size / 5 min slide): each event
    // lands in exactly 2 windows. Shuffle on (window,event_type) only.
    "b8_sliding_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum6(col("value")).as("total_value"))
        .select(
          fmtTs(col("window.start")).as("window_start"),
          fmtTs(col("window.end")).as("window_end"),
          col("event_type"), col("n_events"), col("total_value"))),

    // B9: MERGE/upsert latest-by-key — warehouse-load semantics (reference:
    // src/snowflake/load_to_snowflake_transction.py). Two halves of the
    // events table play base vs. updates; Tables.mergeUpsert keeps the
    // newest row per user. Single shuffle on the merge key.
    "b9_upsert_latest" -> ((s, d) => {
      val ev = t(s, d, "events")
      val base = ev.filter(col("event_id") % 2 === 0)
      val updates = ev.filter(col("event_id") % 2 === 1)
      Tables.mergeUpsert(base, updates, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
                fmtTs(col("ts")).as("last_ts"))
    }),

    // I4: incremental-load diff — two deterministic slices of orders play
    // "yesterday's load" vs "today's" (keys %3/%5 drop different rows;
    // %7 doubles a price), and the report classifies every key as
    // added / removed / changed(+which columns). One full-outer join.
    "i4_load_diff" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val load1 = orders.filter(col("o_orderkey") % 3 =!= 0)
      val load2 = orders.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      Tables.loadDiff(load1, load2, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
        .filter(col("change_type") =!= "unchanged")
    }),

    // B28: mergeable distinct-count sketches — per-year HLL sketches of
    // the customer key, then a sketch-union to the global estimate. The
    // 100 TB incremental pattern: each load materializes its own sketch;
    // re-aggregation merges sketches instead of rescanning history
    // (approx_count_distinct can't merge across runs). Rows-only; the
    // estimate-vs-exact bound is asserted in RelationalSpec.
    "b28_hll_merge" -> ((s, d) => {
      val perYear = t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          count(lit(1)).as("n_rows"))
      perYear.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct_custkeys"),
        sum(col("n_rows")).as("total_rows"),
        count(lit(1)).as("n_sketches"))
    }),

    // B32: exact heavy hitters — order keys appearing ≥ 8 times in
    // lineitem (frequency skew detection: hot keys drive join salting
    // decisions). Two-phase count, one shuffle.
    "b32_heavy_hitters" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") >= 8)),

    // B32b: approximate frequent items via the single-pass Karp-style
    // sketch (DataFrameStatFunctions.freqItems) — the fixed-memory scale
    // path; guaranteed a SUPERSET of the true frequent items at the
    // support (spec asserts containment vs B32). Rows-only.
    "b32_heavy_hitters_approx" -> ((s, d) =>
      t(s, d, "lineitem")
        .stat.freqItems(Seq("l_orderkey"), 0.001)
        .select(explode(col("l_orderkey_freqItems")).as("candidate_key"))
        .orderBy(col("candidate_key"))),

    // B35: count-min-sketch heavy hitters — the MERGEABLE deterministic
    // frequency sketch: depth=4 md5-derived bucket rows × w=2^17 integer
    // cells (4 MB, FIXED however many keys exist; per-load sketches
    // merge by cell-wise addition). Integer cell sums are
    // order-independent, so unlike HLL/freqItems the whole sketch
    // reproduces bit-for-bit in DuckDB — an oracle-checked approximate
    // operator. Estimates only ever OVER-count (collisions add), so
    // thresholding the estimate yields a SUPERSET of the exact b32
    // heavy hitters (containment + bound spec). The fact explodes
    // depth× map-side but partial aggregation collapses each partition
    // to ≤ depth×w cells before the exchange; the estimate join
    // broadcasts the 4 MB sketch.
    // Round-12 measurement pass: the cost was never the md5 (b36's one
    // digest pass over the same fact runs 0.3 s) but the 4×-depth
    // posexplode VOLUME — the one-shot form exploded 600k rows for the
    // cells AND 150k distinct keys again for the estimate (~3M
    // generator rows at sf0.1). Both sides now derive from ONE
    // groupBy(key) count: cells = Σ key-multiplicities per bucket
    // (integers — bit-identical to the row-driven cmsCells, same
    // oracle), and the estimate explodes the same 150k-key frame. The
    // key shuffle replaces the estimate side's old distinct() — same
    // NDV-bound exchange the estimate always paid, now feeding both
    // sides (canonically equal aggregate → one exchange, reused). The
    // row-driven cmsCells stays as the H12 streaming build (per-batch
    // rows are the stream's natural unit). Measured 3.3 → 1.9 s.
    "b35_heavy_hitters_cms" -> ((s, d) => {
      val keyCounts = t(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("kcnt"))
      val exploded = keyCounts.select(col("l_orderkey"), col("kcnt"),
        posexplode(cmsBucketArray(cmsKeyHash(col("l_orderkey")))).as(Seq("r", "bucket")))
      val cells = exploded.groupBy(col("r"), col("bucket"))
        .agg(sum(col("kcnt")).as("cnt"))
      exploded
        .join(broadcast(cells), Seq("r", "bucket"), "left")
        .groupBy(col("l_orderkey"))
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
        .filter(col("est_count") >= 8)
    }),

    // B35b: the MERGE path of the same sketch — one CMS per load slice
    // (l_orderkey % 4 stands in for 4 incremental loads), merged by
    // cell-wise ADDITION, then the same estimate. Counts are integers,
    // so merged cells equal the one-shot cells exactly and both queries
    // hash-match the SAME oracle — the incremental pattern b28 can only
    // rows-check for HLL is exactly verifiable for CMS.
    "b35_cms_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      // per-slice cells from per-slice key counts (the b35 round-12
      // rewrite applied within each load slice — cells bit-identical,
      // merge law untouched: cell-wise ADDITION across slices)
      val perSlice = li
        .withColumn("slice", col("l_orderkey") % 4)
        .groupBy(col("slice"), col("l_orderkey")).agg(count(lit(1)).as("kcnt"))
        .select(col("slice"), col("kcnt"),
          posexplode(cmsBucketArray(cmsKeyHash(col("l_orderkey")))).as(Seq("r", "bucket")))
        .groupBy(col("slice"), col("r"), col("bucket"))
        .agg(sum(col("kcnt")).as("cnt"))
      val merged = perSlice
        .groupBy(col("r"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      cmsThresholdEstimate(li, merged, "l_orderkey", 8)
    }),

    // B36: portable-HLL distinct count — one digest per row map-side,
    // partial max per register before the exchange, 256 rows after it.
    // At 100 TB this is THE distinct-count plan: the shuffle carries
    // ≤ 256 rows per partition regardless of key cardinality (b6's
    // count(DISTINCT) shuffles every distinct key).
    "b36_distinct_hll" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      hllEstimate(hllObservations(li, "l_orderkey")
        .groupBy(col("bucket")).agg(max(col("rho")).as("r")))
    }),

    // B36b: the MERGE path — one register table per load slice
    // (l_orderkey % 4 stands in for 4 incremental loads), merged by
    // register-wise MAX, then the same estimator. max(max) = max
    // exactly, so this hash-matches the SAME oracle as the one-shot
    // form: HLL merge-equivalence checked exactly, not rows-only (b28).
    "b36_hll_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), (col("l_orderkey") % 4).as("slice"))
      val perSlice = hllObservations(li, "l_orderkey", Seq("slice"))
        .groupBy(col("slice"), col("bucket")).agg(max(col("rho")).as("r"))
      val merged = perSlice.groupBy(col("bucket")).agg(max(col("r")).as("r"))
      hllEstimate(merged)
    }),

    // B36c: the GROUPED form — b6's query shape (distinct keys per
    // group) with fixed-memory registers: the shuffle carries ≤ 256
    // rows per (group, partition) however many distinct keys, where
    // count(DISTINCT) shuffles every one. Raw-range precondition holds
    // per group (NDV ≥ 2.5m at every SF — checked before choosing the
    // grouping key).
    "b36_hll_grouped" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_returnflag"), col("l_orderkey"))
      hllEstimate(
        hllObservations(li, "l_orderkey", Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("bucket")).agg(max(col("rho")).as("r")),
        Seq("l_returnflag"))
    }),

    // B45: SLIDING-WINDOW distinct count from mergeable daily HLL
    // cells — the at-scale form of b42's exact running
    // COUNT(DISTINCT): "distinct orders shipped in the trailing 60
    // days, per day". One corpus pass builds (day, bucket, max-rho)
    // cells; EVERYTHING after operates on the fixed days×256 dense
    // frame (registers are literals, days come from the data), so the
    // trailing merge is a per-register RANGE window over day numbers
    // — register-wise max over the window IS the union sketch, the
    // b36_hll_merge law applied along the time axis. The close is the
    // SHARED hllEstimate (grouped by day), so the estimator cannot
    // drift from the b36 family. At 100 TB: b42's exact form carries
    // every distinct key into every window; this carries 256
    // integers per day, however many keys ship. Raw-range accuracy
    // (NDV ≥ 2.5·m = 640) holds for steady-state windows at sf0.01+
    // (sized: avg 1357 at sf0.01, 13574 at sf0.1); ramp-up edge days
    // and sf0.001 sit below raw range — the estimate stays
    // deterministic and oracle-checked there, the accuracy claim is
    // what's scoped.
    "b45_window_hll" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"), col("l_orderkey"))
      windowHllFromCells(dailyHllCells(li, "l_orderkey"))
    }),

    // B47: the b45 estimator's ACCURACY HARNESS (d17's pattern for the
    // windowed sketch): per day, the exact trailing-60-day distinct
    // count beside the HLL estimate and their relative error. The
    // exact side runs as an INTERVAL SWEEP, not a ×60 expansion (the
    // first cut exploded every distinct (day, key) into the 60 window
    // days it serves — 19 s at sf0.1, the top battery entry): a key
    // counts for window-day w iff its LATEST activity ≤ w is within
    // (w−59, w], so per (key, active-day) the served days form the
    // interval [d, min(d+59, next_d − 1)] — disjoint per key by
    // construction — and per-day exact counts are the running sum of
    // ±1 interval endpoints: |pairs|×2 diff events, one bounded
    // cumulative window over ≤ 2·|calendar-days| rows (the c23
    // bounded-ECDF class). Same exact values, 30× less data in
    // flight; still the cost b45 avoids — at 100 TB run it on an
    // evaluation slice, e14's amortization. The estimate side is the
    // checkpointed b45 plan; rel_err is one abs + one division over
    // already-hash-matched inputs.
    "b47_window_hll_error" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"), col("l_orderkey"))
      // ONE corpus scan for both sides (r16, guide §2.4): the exact
      // side needs distinct (day, key) anyway, and daily HLL cells
      // from the DISTINCT pairs are bit-identical to cells from raw
      // rows (groupBy max(rho) is duplicate-insensitive) — the old
      // shape paid a second full scan + a second corpus-wide shuffle
      // to re-derive what this checkpoint already holds.
      val dkPairs = Stage.checkpointFresh(li.distinct())
      val est = windowHllFromCells(dailyHllCells(dkPairs, "l_orderkey"))
        .select(col("ship_day"),
          datediff(col("ship_day"), lit("1970-01-01")).cast("long").as("dnum"),
          col("est_ndv"))
        .localCheckpoint(true)
      val pairs = dkPairs
        .select(datediff(col("ship_day"), lit("1970-01-01")).cast("long").as("dn"),
          col("l_orderkey").as("k"))
      val nxt = Window.partitionBy(col("k")).orderBy(col("dn"))
      val iv = pairs.withColumn("nx", lead(col("dn"), 1).over(nxt))
        .select(col("dn").as("s"),
          when(col("nx").isNull, col("dn") + 59)
            .otherwise(least(col("dn") + 59, col("nx") - 1)).as("e"))
      val counts = iv
        .select(explode(array(
          struct(col("s").as("dnum"), lit(1L).as("delta")),
          struct((col("e") + 1).as("dnum"), lit(-1L).as("delta")))).as("x"))
        .select(col("x.dnum"), col("x.delta"))
        .groupBy(col("dnum")).agg(sum(col("delta")).as("net"))
        .withColumn("exact_ndv", sum(col("net")).over(Window.orderBy(col("dnum"))))
        .select(col("dnum"), col("exact_ndv"))
      est.join(counts, Seq("dnum"))
        .select(col("ship_day"), col("exact_ndv"), col("est_ndv"),
          (abs(col("est_ndv") - col("exact_ndv").cast("double"))
            / col("exact_ndv").cast("double")).as("rel_err"))
    }),

    // B48: SLIDING-WINDOW KMV set-ops — the b45/b46 merge-law-along-
    // the-time-axis pattern applied to the one sketch with set
    // algebra: per ship day, |A|/|B|/|A∪B|/|A∩B|/Jaccard of the
    // trailing-60-day returnflag-A vs -R orderkey slices (b38c's
    // question, online). Closes the sketch×window matrix: HLL (b45),
    // histogram (b46), KMV (here).
    "b48_window_kmv" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_returnflag").isin("A", "R"))
        .select(to_date(col("l_shipdate")).as("ship_day"),
          col("l_returnflag").as("tag"), col("l_orderkey"))
      windowKmvSetops(dailyKmvCells(li, "l_orderkey", "tag", "A", "R"))
    }),

    // B49: trailing-60-day uniform k-row sample per day, from daily
    // bottom-k cells (row identity: orderkey:lineno).
    "b49_window_sample" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"),
          concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("key"))
      windowSample(dailySampleCells(li))
    }),

    // B50: trailing-60-day top-10 suppliers per day, from daily
    // top-256 count cells (complete at every verify scale — see
    // dailyTopCells).
    "b50_window_topk" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"),
          col("l_suppkey").as("key"))
      windowTopK(dailyTopCells(li))
    }),

    // B46: SLIDING-WINDOW quantiles from mergeable daily histogram
    // cells — the b45 pattern applied to b37's sketch: "p50/p95 price
    // over the trailing 60 days, per ship day" (the SLA-dashboard
    // shape). One corpus pass builds (day, bucket, cnt) cells on the
    // GLOBAL [lo, hi] grid (grid sharing is what makes cells mergeable
    // across days — b37_hist_merge's law along the time axis: the
    // trailing union is a per-bucket RANGE-window SUM, integer-exact).
    // The cell table localCheckpoints at ≤ days×64 rows (the b45/i23
    // reuse-trap cut); per-day totals and the cumulative crossing then
    // run on the dense days×64 frame, never the fact. b19's exact form
    // would sort every 60-day slice of the fact per day — this carries
    // 64 integers per day however many rows ship. Accuracy is the b37
    // a-priori bound: one cell width, measured ~0.3% of the range
    // against exact windowed quantiles at sf0.01.
    "b46_window_quantile" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"), col("l_extendedprice"))
      val stats = histStats(li, "l_extendedprice")
      windowQuantileFromCells(
        dailyHistCells(li, "l_extendedprice", stats), stats)
    }),

    // B37: histogram quantile sketch — one stats pass (min/max/count:
    // parquet-footer-servable, like b23's calendar) + one histogram
    // pass collapsing map-side to ≤ 64 cells per partition. Compare
    // b19's exact percentile (full sort per group) and b19b's
    // approx_percentile (accurate but engine-private): this is the
    // fixed-memory mergeable form with a hash-checkable estimate.
    "b37_quantile_hist" -> ((s, d) => {
      val v = t(s, d, "lineitem").select(col("l_extendedprice"))
      val stats = histStats(v, "l_extendedprice")
      val cells = v.crossJoin(stats)
        .select(histBucket(col("l_extendedprice")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      histQuantileEstimate(cells, stats, Seq(0.25, 0.5, 0.75, 0.95))
    }),

    // B37b: the MERGE path — per-slice histograms against the SAME
    // global [lo, hi], merged by cell-wise addition (integer-exact), so
    // it must hash-match the one-shot oracle. The incremental-quantile
    // pattern a warehouse runs: histogram per load, merge at query time.
    "b37_hist_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_extendedprice"), (col("l_orderkey") % 4).as("slice"))
      val stats = histStats(li, "l_extendedprice")
      val perSlice = li.crossJoin(stats)
        .select(col("slice"), histBucket(col("l_extendedprice")).as("bucket"))
        .groupBy(col("slice"), col("bucket")).agg(count(lit(1)).as("cnt"))
      val merged = perSlice.groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
      histQuantileEstimate(merged, stats, Seq(0.25, 0.5, 0.75, 0.95))
    }),

    // B37c: the GROUPED histogram-quantile sketch — per-category
    // percentiles at fixed memory, completing the sketch×grouped
    // matrix (b36_hll_grouped's quantile sibling). Per-group [lo, hi]
    // stays a DataFrame joined back UNHINTED (group cardinality is
    // unbounded — the g5/c11 rule — unlike the global form's 1-row
    // driver literal); the wire then carries ≤64 cells PER GROUP
    // regardless of row count, and everything after the histogram is
    // |groups|×64 rows. The b19 exact form sorts every group's rows;
    // this is the 100 TB replacement when groups are wide.
    "b37_hist_grouped" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("v"))
      val stats = li.groupBy(col("l_returnflag")).agg(
        min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n"))
      val cells = li.join(stats, Seq("l_returnflag"))
        .select(col("l_returnflag"), histBucket(col("v")).as("bucket"))
        .groupBy(col("l_returnflag"), col("bucket")).agg(count(lit(1)).as("cnt"))
      val quantiles = s.range(1).select(
        explode(array(Seq(0.5, 0.95).map(lit(_)): _*)).as("quantile"))
      cells
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("bucket"))))
        .join(stats, Seq("l_returnflag"))
        .crossJoin(broadcast(quantiles))
        .filter(col("cum").cast("double") >= col("quantile") * col("n").cast("double"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag"), col("quantile"))
            .orderBy(col("bucket"))))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("quantile"),
          (col("lo") + (col("hi") - col("lo")) / lit(64.0) *
            (col("bucket").cast("double") +
              (col("quantile") * col("n").cast("double")
                - (col("cum") - col("cnt")).cast("double")) / col("cnt").cast("double")))
            .as("est_value"))
    }),

    // B37d: the grouped MERGE path — per-slice grouped histograms
    // against the same per-group [lo, hi], merged by (group, bucket)
    // integer addition, so it hash-matches b37c's oracle exactly (the
    // b35/b36/b37/b38 merge-equivalence pattern, now for the grouped
    // member): histogram per load slice, per-category quantiles at
    // query time without touching the rows again.
    "b37_hist_grouped_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("v"),
          (col("l_orderkey") % 4).as("slice"))
      val stats = li.groupBy(col("l_returnflag")).agg(
        min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n"))
      val perSlice = li.join(stats, Seq("l_returnflag"))
        .select(col("slice"), col("l_returnflag"), histBucket(col("v")).as("bucket"))
        .groupBy(col("slice"), col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val cells = perSlice.groupBy(col("l_returnflag"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      val quantiles = s.range(1).select(
        explode(array(Seq(0.5, 0.95).map(lit(_)): _*)).as("quantile"))
      cells
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("bucket"))))
        .join(stats, Seq("l_returnflag"))
        .crossJoin(broadcast(quantiles))
        .filter(col("cum").cast("double") >= col("quantile") * col("n").cast("double"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag"), col("quantile"))
            .orderBy(col("bucket"))))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("quantile"),
          (col("lo") + (col("hi") - col("lo")) / lit(64.0) *
            (col("bucket").cast("double") +
              (col("quantile") * col("n").cast("double")
                - (col("cum") - col("cnt")).cast("double")) / col("cnt").cast("double")))
            .as("est_value"))
    }),

    // B38: KMV/MinCount distinct sketch — bucketed minima, harmonic
    // integer-sum estimator (family note at kmvObservations). Same
    // fixed-memory shuffle shape as b36; what it adds over HLL is the
    // set-operation algebra exercised by b38_kmv_setops.
    "b38_kmv_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      kmvEstimate(kmvObservations(li, "l_orderkey")
        .groupBy(col("bucket")).agg(min(col("v")).as("v")))
    }),

    // B38b: the MERGE path — per-slice bucket minima merged by
    // bucket-wise MIN. min(min) = min exactly, so this hash-matches the
    // SAME oracle as the one-shot form (the b35/b36/b37 pattern).
    "b38_kmv_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), (col("l_orderkey") % 4).as("slice"))
      val perSlice = kmvObservations(li, "l_orderkey", Seq("slice"))
        .groupBy(col("slice"), col("bucket")).agg(min(col("v")).as("v"))
      kmvEstimate(perSlice.groupBy(col("bucket")).agg(min(col("v")).as("v")))
    }),

    // B38c: sketch SET OPERATIONS — |A|, |B|, |A∪B| from one scan
    // (conditional per-tag minima per bucket; the union minimum is the
    // min across tags, i.e. the merged sketch), then |A∩B| by
    // inclusion-exclusion and a Jaccard estimate. The warehouse
    // question this answers at 100 TB: "how many customers/keys do two
    // slices share" without ever shuffling a distinct key — audience
    // overlap, incremental-load novelty rate, cross-partition key
    // containment. A = orderkeys with returnflag A lineitems, B = with
    // R; measured accuracy at sf0.01: A +4.3%, B +5.0%, U +3.4%,
    // I +6.8% (intersection differences three ±1/√k estimates, so its
    // error scale is the UNION size — spec'd ≤20% of u, not of i).
    // Deterministic throughout ⇒ exact DuckDB oracle.
    "b38_kmv_setops" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("tag"), col("l_orderkey"))
      val m = kmvObservations(li, "l_orderkey", Seq("tag"))
        .groupBy(col("bucket")).agg(
          coalesce(min(when(col("tag") === "A", col("v"))), lit(-1L)).as("va"),
          coalesce(min(when(col("tag") === "R", col("v"))), lit(-1L)).as("vb"),
          min(col("v")).as("vu"))
      val sums = m.agg(
        sum(when(col("va") === lit(-1L), lit(0L)).otherwise(col("va") + lit(1L))).as("sa"),
        sum(when(col("va") === lit(-1L), lit(0L)).otherwise(lit(1L))).as("ca"),
        sum(when(col("vb") === lit(-1L), lit(0L)).otherwise(col("vb") + lit(1L))).as("sb"),
        sum(when(col("vb") === lit(-1L), lit(0L)).otherwise(lit(1L))).as("cb"),
        sum(col("vu") + lit(1L)).as("su"),
        count(lit(1)).as("cu"))
      sums
        .select(kmvEst(col("sa"), col("ca")).as("est_a"),
          kmvEst(col("sb"), col("cb")).as("est_b"),
          kmvEst(col("su"), col("cu")).as("est_union"))
        .select(col("est_a"), col("est_b"), col("est_union"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
          ((col("est_a") + col("est_b") - col("est_union")) / col("est_union"))
            .as("jaccard_est"))
    }),

    // B39: Benford first-digit analysis — the classic screen for
    // fabricated amounts (reference: fraud-rule family, spark.py's
    // amount-threshold rules generalized to a distribution test).
    // Leading digit via bigint-to-string (identical formatting in both
    // engines — no log10, whose libm tail is engine-dependent); the
    // Benford expectations ride as nine literal constants spelled
    // identically in the oracle (§6b: never derive constants). One
    // map-side-combined 9-group aggregate, with the grand total as a
    // 1-row scalar aggregate broadcast-crossJoined back (the
    // psiFromCells idiom, swept here by the r7 verdict — the former
    // Window.partitionBy() total was bounded at 9 rows but was the
    // exact pattern psiFromCells eliminated; integer sums are
    // order-independent so the swap is oracle-neutral, and PlanSpec
    // now pins the no-Window shape). Scan-bound at any scale.
    "b39_benford" -> ((s, d) => {
      val expected = typedLit(Seq(0.30103, 0.17609, 0.12494, 0.09691,
        0.07918, 0.06695, 0.05799, 0.05115, 0.04576))
      val counts = t(s, d, "lineitem")
        .select(substring(floor(col("l_extendedprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
        .select(col("digit"), col("cnt"),
          round(col("cnt").cast("double") / col("total"), 8).as("obs_p"),
          element_at(expected, col("digit").cast("int")).as("exp_p"))
        .withColumn("abs_dev", round(abs(col("obs_p") - col("exp_p")), 8))
    }),

    // B40: GROUPING SETS — the explicit multi-grain form between
    // rollup (b14) and cube (b14b): exactly the grains asked for, one
    // pass, Expand feeds a single hash aggregate (rows × n_grains
    // map-side, partials combined before the one exchange).
    "b40_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_items"),
          dsum2(col("l_extendedprice")).as("total_value"))),

    // B41: deterministic mode + exact median per group. Spark's mode()
    // is explicitly nondeterministic on ties, so the mode is computed
    // from the (group, value) count table with a total order
    // (count desc, value asc) — reproducible on any cluster and by the
    // oracle's QUALIFY argmax. Median = exact interpolated percentile;
    // quantities are integer-valued so the midpoint arithmetic is
    // IEEE-exact in both engines. Two keyed aggregates + a 50-row
    // window per group — the count table is |group|×|distinct values|,
    // never the fact table, so the window input is tiny at any scale.
    "b41_mode_median" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val mode = counts
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("c").desc, col("l_quantity"))))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("c").as("mode_count"))
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"))
      mode.join(med, Seq("l_returnflag"))
    }),

    // B42: running COUNT(DISTINCT) over a window — Spark (like every
    // engine) rejects distinct aggregates in window frames, so it is
    // rebuilt from primitives: a first-occurrence flag (row_number = 1
    // over (user, type)) then a running sum of flags over (user). The
    // explicit repartition on user_id makes BOTH windows run off ONE
    // exchange: HashPartitioning(user) satisfies the finer window's
    // ClusteredDistribution(user, type) (same-key rows stay co-located
    // under the coarser hash), so Catalyst inserts only the two sorts —
    // without it, EnsureRequirements shuffles twice ((user,type) then
    // user; measured). The standard trick where the naive form (a
    // distinct subquery per row) is O(n²).
    "b42_window_distinct" -> ((s, d) => {
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .repartition(col("user_id"))
        .withColumn("first_occ",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("distinct_types", sum(col("first_occ")).over(wRun))
        .select("event_id", "user_id", "distinct_types")
    }),

    // B43: per-group feature scaling — min-max, z-score, and percentile
    // rank in one pass, the standard ML feature-prep triple. Moments
    // ride exact decimal sums (c11's recipe: order-independent ⇒
    // cluster-size-independent), the stats join back UNHINTED (one row
    // per group — AQE broadcasts), and percent_rank shares the same
    // (group, x) sort the window already needs. Ties in percent_rank
    // take equal ranks — deterministic in both engines by definition
    // (rank-1)/(n-1).
    "b43_feature_scale" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_extendedprice").as("x"))
      val stats = li.groupBy(col("l_returnflag")).agg(
        min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum((col("x") * col("x")).cast("decimal(28,6)")).cast("double").as("sx2"))
      val mean = col("sx") / col("n")
      val variance = (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
      val wpr = Window.partitionBy(col("l_returnflag")).orderBy(col("x"))
      li.join(stats, Seq("l_returnflag"))
        .withColumn("minmax", round((col("x") - col("mn")) / (col("mx") - col("mn")), 8))
        .withColumn("zscore", round((col("x") - mean) / sqrt(variance), 8))
        // percent_rank is (rank−1)/(n−1), a ratio of exact ints — left
        // unrounded (raw quotient is engine-identical; rounding an
        // integer ratio risks a true decimal tie, §6b)
        .withColumn("pct_rank", percent_rank().over(wpr))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "x",
          "minmax", "zscore", "pct_rank")
    }),

    // B43b: the 100 TB form of the per-group feature scaler — b43's
    // percent_rank window concentrates the WHOLE fact onto |groups|
    // partitions (3 return flags ⇒ 3 reducers at any scale); this twin
    // replaces it with a deterministic 128-cell histogram rank (the b21/
    // b37 move applied to ranking): per-group cell counts are map-side-
    // combined partials, the cumulative below-mass is a window over
    // ≤128 rows per group, and the join-back is a broadcast of a
    // ≤|groups|×128-row table — no data-sized ordered partition
    // anywhere. minmax/zscore are identical to b43 (broadcast-stats
    // arithmetic). pct_rank_approx = strictly-below mass / (n−1) is an
    // exact-integer ratio off the same floor-bucket rule as b21/c23, so
    // unlike percentile_approx sketches it is engine-portable and
    // carries a FULL DuckDB oracle; accuracy vs the exact rank is
    // bounded by one cell's mass (RelationalSpec).
    "b43_feature_scale_approx" -> ((s, d) => {
      val k = 128
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_extendedprice").as("x"))
      val stats = li.groupBy(col("l_returnflag")).agg(
        min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum((col("x") * col("x")).cast("decimal(28,6)")).cast("double").as("sx2"))
      val mean = col("sx") / col("n")
      val variance = (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
      val bucketed = li.join(stats, Seq("l_returnflag"))
        .withColumn("bucket",
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(
              floor((col("x") - col("mn")) /
                ((col("mx") - col("mn")) / lit(k.toDouble))).cast("long"),
              lit(k - 1L))))
      val cells = bucketed.groupBy(col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val wcum = Window.partitionBy(col("l_returnflag")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = cells
        .withColumn("below", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
        .select(col("l_returnflag"), col("bucket"), col("below"))
      bucketed.join(cum, Seq("l_returnflag", "bucket"))
        .withColumn("minmax", round((col("x") - col("mn")) / (col("mx") - col("mn")), 8))
        .withColumn("zscore", round((col("x") - mean) / sqrt(variance), 8))
        .withColumn("pct_rank_approx",
          when(col("n") > 1,
            col("below").cast("double") / (col("n") - 1).cast("double"))
            .otherwise(lit(0.0)))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "x",
          "minmax", "zscore", "pct_rank_approx")
    }),

    // B44: gaps-and-islands activity streaks — "longest run of
    // consecutive active days per user", the classic islands problem:
    // day − row_number(day) is constant within a consecutive run, so
    // one window + two tiny aggregates replace any iterative scan. The
    // up-front repartition on user_id makes the WHOLE chain ride ONE
    // exchange (the b42 lesson): HashPartitioning(user) satisfies the
    // distinct's ClusteredDistribution(user, day), the window's (user),
    // and both downstream aggregates' — everything after the shuffle is
    // sorts and map-side partials. All-integer/date arithmetic ⇒
    // engine-exact.
    "b44_activity_streaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .repartition(col("user_id"))
        .distinct()
        .withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak_len"))
        .groupBy(col("user_id"))
        .agg(max(col("streak_len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("streak_len")).as("n_active_days"))
    }),

    // I7: CDC changelog apply — events play an I/U/D change stream on
    // the user key (deterministic op from the event id); the newest
    // change wins, trailing deletes drop the key. The MERGE…DELETE
    // pattern an incremental warehouse needs beyond plain upsert.
    "i7_cdc_apply" -> ((s, d) => {
      val changes = t(s, d, "events")
        .withColumn("op", when(col("event_id") % 10 < 2, "D").otherwise("U"))
      Tables.applyCdc(changes, Seq("user_id"),
          Seq(col("ts"), col("event_id")), "op")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), fmtTs(col("ts")).as("last_ts"), col("op"))
    }),

    // I14: SCD2 (slowly-changing-dimension type-2) history build from
    // the same CDC change stream i7 applies — the full version-interval
    // form of latest-wins: every U change opens a version row with
    // [valid_from, valid_to) stamped by the NEXT change of any kind
    // (a D closes the last version without opening one, so a deleted
    // key has history but no current row; is_current = open interval).
    // Plan shape: the lead() and the post-filter version row_number()
    // share one (user_id) partitioning — ONE shuffle for the whole
    // history build, no self-joins (the naive form is changes ⟕ changes
    // on "next change of this key").
    "i14_scd2_history" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("op", when(col("event_id") % 10 < 2, "D").otherwise("U"))
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
        .filter(col("op") === "U")
        .withColumn("version", row_number().over(w).cast("long"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          col("version"),
          fmtTs(col("ts")).as("valid_from"),
          fmtTs(col("valid_to_ts")).as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
    }),

    // B31: funnel analysis — per user, the earliest view, the earliest
    // click AFTER that view, the earliest purchase AFTER that click
    // (strict event-order attribution). Three chained unordered window
    // minima over the same user partitioning ⇒ ONE shuffle for the whole
    // funnel; no self-joins.
    "b31_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      t(s, d, "events")
        .withColumn("view_ts",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("click_ts",
          min(when(col("event_type") === "click" && col("ts") > col("view_ts"),
            col("ts"))).over(w))
        .withColumn("purchase_ts",
          min(when(col("event_type") === "purchase" && col("ts") > col("click_ts"),
            col("ts"))).over(w))
        .select(col("user_id"),
          fmtTs(col("view_ts")).as("view_ts"),
          fmtTs(col("click_ts")).as("click_ts"),
          fmtTs(col("purchase_ts")).as("purchase_ts"),
          when(col("purchase_ts").isNotNull, "purchase")
            .when(col("click_ts").isNotNull, "click")
            .when(col("view_ts").isNotNull, "view")
            .otherwise("none").as("stage"))
        .distinct()
    }),

    // B30: time-series gap filling — daily sales per priority with every
    // missing (day, priority) cell emitted as an explicit zero row. The
    // generated day×priority dim is tiny (span × 5); the only fact-side
    // work is the daily aggregation, so gap filling costs one extra
    // small join regardless of corpus size.
    "b30_gapfill" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val daily = orders
        .groupBy(to_date(col("o_orderdate")).as("day"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("day_sales"),
             count(lit(1)).as("n_orders"))
      val days = orders
        .agg(to_date(min(col("o_orderdate"))).as("d0"),
             to_date(max(col("o_orderdate"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val dims = orders.select(col("o_orderpriority")).distinct()
      days.crossJoin(dims)
        .join(daily, Seq("day", "o_orderpriority"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("o_orderpriority"),
          coalesce(col("day_sales"), lit(0.0)).as("day_sales"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // B10: date-part derivation (reference: src/spark/jobs/spark.py
    // year/month/dayofmonth partition columns).
    "b10_date_parts" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("tx_year"),
          month(col("o_orderdate")).cast("long").as("tx_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("tx_day"))),

    // B11a: running total + lag per customer. Decimal running sum keeps the
    // value exact and engine-independent; total ordering via the unique
    // orderkey tiebreaker makes every row deterministic.
    "b11_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wl = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("run_total"),
        lag(col("o_totalprice"), 1).over(wl).as("prev_total"))
    }),

    // B11b: top-N per key via row_number (deterministic tiebreak).
    "b11_rank_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),

    // B33: lead/lag event sequencing — inter-event gap (exact
    // microseconds), next event type, and a gap-based session-start
    // flag. One shuffle on the user key; the window frame is row-local
    // after the per-user sort. (user, us-timestamp) is unique in the
    // data, so the ordering is total and engine-independent.
    "b33_event_gaps" -> ((s, d) => {
      val wl = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(
          col("user_id"), col("event_id"), fmtTs(col("ts")).as("event_ts"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wl)))
            .as("prev_gap_us"),
          lead(col("event_type"), 1).over(wl).as("next_type"))
        .withColumn("is_new_session",
          col("prev_gap_us").isNull || col("prev_gap_us") > 1800L * 1000000L)
    }),

    // B34: bloom-prefiltered semi join — Spark's runtime-row-filter
    // pattern applied deliberately. The selective dim side (urgent
    // orders) aggregates into a ~90KB Bloom sketch — a bounded
    // driver-collected value, broadcast back as a literal like model
    // state — and the fact scan drops non-members BEFORE the join
    // shuffle; the exact semi join then removes the ~3% false
    // positives, so the result is identical to the plain form (both
    // share one oracle). The shuffle_hash hint models the big-dim
    // regime where broadcast is impossible and the fact-side shuffle
    // volume is the cost being cut — at 100 TB the prefilter keeps
    // ~77% of the fact out of the exchange.
    "b34_bloom_prejoin" -> ((s, d) => {
      import graft.functions.BloomFunctions._
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bloomBytes = dim
        .agg(bloomFilterAgg(col("o_orderkey"), 100000L, 720000L).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      t(s, d, "lineitem")
        .filter(mightContain(lit(bloomBytes), col("l_orderkey")))
        .join(dim.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          dsum2(col("l_extendedprice")).as("total_value"))
    }),

    // B34's unfiltered twin — same plan minus the bloom prefilter, same
    // oracle; benched side-by-side to price the fact-shuffle reduction.
    "b34_semi_plain" -> ((s, d) => {
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      t(s, d, "lineitem")
        .join(dim.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          dsum2(col("l_extendedprice")).as("total_value"))
    }),

    // B12: global top-k — Spark executes sort+limit as per-partition top-k
    // then a k-row merge on one reducer; never a full global sort.
    "b12_topk" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    // B13: distinct — hash aggregate with map-side partials.
    "b13_distinct" -> ((s, d) =>
      t(s, d, "orders").select("o_orderstatus", "o_orderpriority").distinct()),

    // B14: rollup — multi-level trend totals in one pass
    // (reference: warehouse trend queries aggregate at several grains).
    "b14_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("tx_year", year(col("o_orderdate")).cast("long"))
        .rollup(col("tx_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_value"))),

    // B16: session windows — gaps-and-islands sessionization as a single
    // native operator; at scale this shuffles once on the user key and
    // sessionizes within partitions (vs. the window-function islands
    // formulation, which needs the same shuffle plus two window passes).
    "b16_session_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum6(col("value")).as("total_value"))
        .select(
          fmtTs(col("session_window.start")).as("window_start"),
          fmtTs(col("session_window.end")).as("window_end"),
          col("user_id"), col("n_events"), col("total_value"))),

    // B17: pivot — per-priority yearly totals as a crosstab (warehouse
    // trend report shape). Pivot values are enumerated, so this stays a
    // single pass with map-side partial aggregation.
    "b17_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("tx_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("o_orderpriority"))
        .pivot("tx_year", Seq(1995L, 1996L, 1997L, 1998L, 1999L, 2000L, 2001L))
        .agg(dsum2(col("o_totalprice")))),

    // B18: conditional aggregation — rule-style measures in one pass.
    "b18_conditional_agg" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          count(when(col("o_totalprice") > 250000, 1)).as("n_large"),
          dsum2(when(col("o_totalprice") > 250000, col("o_totalprice")).otherwise(0))
            .as("large_value"),
          (count(when(col("o_totalprice") > 250000, 1)).cast("double") /
            count(lit(1))).as("large_share"))),

    // B24: distribution ranking — spend quartiles + percentile position
    // per customer. Global ordered window ⇒ a range-partitioned sort at
    // scale (1 row per customer post-aggregation, so the sort input is
    // the dimension cardinality, not the fact).
    "b24_ntile" -> ((s, d) => {
      val totals = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum2(col("o_totalprice")).as("total_spent"))
      val w = Window.orderBy(col("total_spent").desc, col("o_custkey"))
      totals.select(col("o_custkey"), col("total_spent"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
    }),

    // B24b: the distributed form of B24 — quartile thresholds from one
    // percentile_approx aggregation (fixed-size sketch), broadcast back
    // and compared per row. No global single-partition ordered window:
    // at a billion customers B24's Window.orderBy funnels every row
    // through one reducer; this plan is two ordinary aggregations + a
    // map-side comparison, fully parallel at any cardinality. Rows-only
    // (sketch boundaries are engine-specific); RelationalSpec asserts
    // quartile agreement with exact ntile away from the boundary values.
    "b24_ntile_approx" -> ((s, d) => {
      val totals = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum2(col("o_totalprice")).as("total_spent"))
      val thresholds = totals.agg(
        percentile_approx(col("total_spent"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
        .select(element_at(col("q"), 1).as("q25"),
                element_at(col("q"), 2).as("q50"),
                element_at(col("q"), 3).as("q75"))
      totals.crossJoin(broadcast(thresholds))
        .select(col("o_custkey"), col("total_spent"),
          when(col("total_spent") >= col("q75"), 1)
            .when(col("total_spent") >= col("q50"), 2)
            .when(col("total_spent") >= col("q25"), 3)
            .otherwise(4).as("quartile"))
    }),

    // B19b: approx quantiles (fixed-size sketch) — the 100 TB path for
    // B19: exact per-group percentiles sort every group; the sketch is
    // one aggregation pass with bounded memory. Rows-only (sketch
    // internals are engine-specific).
    "b19_quantiles_approx" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), array(lit(0.5), lit(0.9)), lit(10000))
          .as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p50_qty"),
          element_at(col("q"), 2).as("p90_qty"))),

    // B19: exact quantiles per group (sort-based percentile).
    "b19_quantiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n_rows"))),

    // B20: correlation from exact decimal moments — the same
    // order-independence trick as the z-score: every sum is exact, the
    // final arithmetic runs on reproducible doubles, so the coefficient
    // is identical on any cluster size (corr()'s streaming update order
    // would not be).
    "b20_corr" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sx"),
        sum(col("l_discount").cast("decimal(18,6)")).cast("double").as("sy"),
        sum((col("l_extendedprice") * col("l_discount")).cast("decimal(28,10)")).cast("double").as("sxy"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(28,6)")).cast("double").as("sx2"),
        sum((col("l_discount") * col("l_discount")).cast("decimal(28,12)")).cast("double").as("sy2"))
      // moments wider than double's 15-17 significant digits convert
      // differently across engines and the covariance cancellation
      // amplifies that last-ulp gap, so the coefficient is pinned to
      // 7 decimals — far beyond any analytical use of a correlation
      .withColumn("corr_price_discount",
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
           sqrt(col("n") * col("sy2") - col("sy") * col("sy"))), 7))
      .select("n", "corr_price_discount")),

    // B21: histogram bucketing — fixed-width value distribution.
    "b21_histogram" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_extendedprice")).as("bucket_value"))),

    // B22: as-of join — each event paired with the user's latest order at
    // or before the event time, as a union + sorted fill-forward: both
    // sides are tagged and unioned, shuffled ONCE on the user key, sorted
    // by (time, tag), and each event row picks up the last non-null order
    // struct before it (`last(..., ignoreNulls)` over the running frame).
    // ZERO join expansion — the hot-key cost is sorting the user's own
    // rows (events + orders), never their cross product: a user with 10⁴
    // events × 10³ orders costs 1.1×10⁴ sorted rows here vs the 10⁷
    // joined-then-ranked rows of the equi-join + rank-1 formulation
    // (which this replaced; a month-bucket equi-prejoin would merely
    // bound that expansion — the sort removes it). Orders sort before
    // events at equal timestamps (tag 0 < 1), making the match
    // inclusive; ties among same-date orders resolve to the max order
    // key, matching the (date desc, key desc) rank of the oracle.
    "b22_asof_join" -> ((s, d) => {
      val orderSide = t(s, d, "orders").select(
        col("o_custkey").as("user_id"),
        col("o_orderdate").as("sort_ts"),
        lit(0).as("tag"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("timestamp").as("ts"),
        struct(col("o_orderdate"), col("o_orderkey")).as("ord"))
      val eventSide = t(s, d, "events").select(
        col("user_id"),
        col("ts").as("sort_ts"),
        lit(1).as("tag"),
        col("event_id"),
        col("ts"),
        lit(null).cast("struct<o_orderdate:timestamp,o_orderkey:bigint>").as("ord"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sort_ts"), col("tag"), col("ord.o_orderkey").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orderSide.unionByName(eventSide)
        .withColumn("last_ord", last(col("ord"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("event_ts"),
                col("last_ord.o_orderkey").as("last_orderkey"),
                fmtTs(col("last_ord.o_orderdate")).as("last_orderdate"))
    }),

    // B23: range (interval) join — events against a derived calendar of
    // month intervals. The interval dim is tiny and broadcast, so the
    // range predicate evaluates map-side on the fact scan — the right
    // plan when one side is an interval table; an equi-bucket prejoin
    // (b8-style window expansion) is the alternative when both sides are
    // huge. The calendar comes from ONE scalar min/max aggregate over the
    // ts column + sequence(), not a distinct over the fact: the bounds
    // scan is column-pruned and its partial agg collapses to one row per
    // partition map-side (at 100 TB it can be served from parquet footer
    // stats via v2 aggregate pushdown); a distinct would shuffle every
    // distinct month from every partition AND scan the fact a second
    // time just to learn the calendar. Months with no events disappear in
    // the inner join either way, so the result is identical.
    "b23_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val months = ev
        .agg(date_trunc("month", min(col("ts"))).as("lo"),
             date_trunc("month", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL '1' MONTH"))).as("month_start"))
        .withColumn("month_end", add_months(col("month_start"), 1))
      ev.join(broadcast(months),
          col("ts") >= col("month_start") && col("ts") < col("month_end"))
        .groupBy(col("month_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum6(col("value")).as("total_value"))
        .select(fmtTs(col("month_start")).as("month_start"),
                col("event_type"), col("n_events"), col("total_value"))
    }),

    // B14b: cube — all grouping-set combinations in one pass.
    "b14_cube" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("tx_year", year(col("o_orderdate")).cast("long"))
        .cube(col("tx_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_value"))),

    // B25: set operations — intersect/except between two incremental
    // load slices (which orders appear in both loads / only in the
    // first). Both compile to aggregate-based set ops, shuffled on the
    // full row — the relational complement to B15's union-dedup.
    "b25_setops" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderstatus")
      val b = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderstatus")
      a.intersect(b).withColumn("src", lit("both"))
        .union(a.except(b).withColumn("src", lit("first_only")))
    }),

    // B15: union of two overlapping incremental loads + whole-row dedup
    // (reference: incremental loads re-scan overlapping partitions).
    "b15_union_dedup" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_totalprice")
      val b = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_totalprice")
      a.union(b).distinct()
    })
  )

  /** DuckDB-equivalent SQL for the driver's oracle. Every computed column
    * is aliased identically to the Spark side; money sums use the same
    * exact-decimal pattern; literals that would default to DECIMAL in
    * DuckDB are cast to DOUBLE where the Spark side computes doubles.
    */
  /** Shared B35/B35b oracle: merge of per-slice integer sketches IS the
    * one-shot sketch, so both queries must hash-match this one SQL.
    */
  private val cmsOracleSql: String =
    """WITH hk AS (
      |  SELECT l_orderkey,
      |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
      |           % 2147483647 AS h
      |  FROM lineitem),
      |g AS (SELECT unnest(range(0, 4)) AS r),
      |c AS (
      |  SELECT r, bucket, count(*) AS cnt FROM (
      |    SELECT g.r,
      |           ((((g.r * 2654435761 + 1) % 2147483647) * hk.h + (g.r * 40503 + 17))
      |             % 2147483647) % 131072 AS bucket
      |    FROM hk, g)
      |  GROUP BY r, bucket),
      |k AS (SELECT DISTINCT l_orderkey, h FROM hk),
      |kb AS (
      |  SELECT k.l_orderkey, g.r,
      |         ((((g.r * 2654435761 + 1) % 2147483647) * k.h + (g.r * 40503 + 17))
      |           % 2147483647) % 131072 AS bucket
      |  FROM k, g)
      |SELECT kb.l_orderkey, min(c.cnt) AS est_count
      |FROM kb JOIN c ON c.r = kb.r AND c.bucket = kb.bucket
      |GROUP BY kb.l_orderkey
      |HAVING min(c.cnt) >= 8""".stripMargin

  /** Shared B36/B36b oracle: register-wise max of per-slice registers IS
    * the one-shot register table, so both queries hash-match this one
    * SQL. The indicator sum is the exact integer Σ 2^(53-r); the final
    * estimate uses only correctly-rounded IEEE ops (no ln/exp/pow), so
    * the double reproduces bit-for-bit.
    */
  private val hllOracleSql: String =
    """WITH hk AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem),
      |regs AS (
      |  SELECT h & 255 AS bucket,
      |         max(53 - length(ltrim(bin(h >> 8), '0'))) AS r
      |  FROM hk GROUP BY bucket),
      |s AS (
      |  SELECT sum(CAST(1 AS BIGINT) << (53 - r)) AS s_present, count(*) AS registers_set
      |  FROM regs)
      |SELECT CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
      |       * CAST(65536 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE)
      |       / CAST(s_present + (256 - registers_set) * CAST(9007199254740992 AS BIGINT) AS DOUBLE)
      |         AS est_ndv,
      |       registers_set
      |FROM s""".stripMargin

  /** Shared B37/B37b oracle: cell-wise addition of per-slice integer
    * histograms is exactly the one-shot histogram; interpolation is
    * plain IEEE arithmetic in matched evaluation order.
    */
  /** Shared B38/B38b oracle: bucket-wise min of per-slice minima IS the
    * one-shot minima table, so both queries hash-match this one SQL.
    * Σ(v+1) is an exact integer (≤ 2^60) — order-free — and the
    * estimate is one correctly-rounded division. Sum cast back to
    * BIGINT (DuckDB SUM(BIGINT) → HUGEINT, the §6b rule).
    */
  /** The KMV harmonic estimator as SQL — ONE generator for every
    * oracle in the b38/b48 family (the round-8 shared-generator rule:
    * repeated float expressions interpolate once, so operand order
    * cannot diverge between positions). `s`/`c` are the occupied-sum
    * and occupied-count SQL expressions.
    */
  private def kmvEstSql(s: String, c: String): String =
    s"CAST(295147905179352825856 AS DOUBLE) / CAST($s + (256 - $c) * " +
      "CAST(4503599627370496 AS BIGINT) AS DOUBLE) - CAST(256 AS DOUBLE)"

  private val kmvOracleSql: String =
    s"""WITH hk AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem),
      |m AS (SELECT h & 255 AS bucket, min(h >> 8) AS v FROM hk GROUP BY 1),
      |s AS (SELECT CAST(sum(v + 1) AS BIGINT) AS s_occ, count(*) AS buckets_set FROM m)
      |SELECT ${kmvEstSql("s_occ", "buckets_set")} AS est_ndv,
      |       buckets_set
      |FROM s""".stripMargin

  /** B38c oracle: the same three estimates by inclusion-exclusion. */
  private val kmvSetopsOracleSql: String =
    s"""WITH hk AS (
      |  SELECT l_returnflag AS tag,
      |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |m AS (
      |  SELECT h & 255 AS bucket,
      |         coalesce(min(CASE WHEN tag = 'A' THEN h >> 8 END), -1) AS va,
      |         coalesce(min(CASE WHEN tag = 'R' THEN h >> 8 END), -1) AS vb,
      |         min(h >> 8) AS vu
      |  FROM hk GROUP BY 1),
      |s AS (
      |  SELECT CAST(sum(CASE WHEN va = -1 THEN 0 ELSE va + 1 END) AS BIGINT) AS sa,
      |         CAST(sum(CASE WHEN va = -1 THEN 0 ELSE 1 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN vb = -1 THEN 0 ELSE vb + 1 END) AS BIGINT) AS sb,
      |         CAST(sum(CASE WHEN vb = -1 THEN 0 ELSE 1 END) AS BIGINT) AS cb,
      |         CAST(sum(vu + 1) AS BIGINT) AS su, count(*) AS cu
      |  FROM m),
      |e AS (
      |  SELECT ${kmvEstSql("sa", "ca")} AS est_a,
      |         ${kmvEstSql("sb", "cb")} AS est_b,
      |         ${kmvEstSql("su", "cu")} AS est_union
      |  FROM s)
      |SELECT est_a, est_b, est_union, est_a + est_b - est_union AS est_intersect,
      |       (est_a + est_b - est_union) / est_union AS jaccard_est
      |FROM e""".stripMargin

  /** B48 oracle: the b38c conditional-minima + estimator algebra keyed
    * by ship_day, with the trailing union as a per-bucket RANGE-window
    * MIN over the dense days×256 frame (the windowHllOracleSql shape).
    * NULL marks slice-absent (window min ignores it on both engines);
    * the two-slice union min is the SAME explicit CASE the engine
    * spells (never least() — its NULL handling is engine-defined).
    */
  private val windowKmvOracleSql: String =
    s"""WITH hk AS (
      |  SELECT CAST(l_shipdate AS DATE) AS ship_day, l_returnflag AS tag,
      |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |cells AS (
      |  SELECT ship_day, h & 255 AS bucket,
      |         min(CASE WHEN tag = 'A' THEN h >> 8 END) AS va,
      |         min(CASE WHEN tag = 'R' THEN h >> 8 END) AS vb
      |  FROM hk GROUP BY 1, 2),
      |days AS (
      |  SELECT DISTINCT ship_day,
      |         date_diff('day', DATE '1970-01-01', ship_day) AS day_num
      |  FROM cells),
      |regs AS (SELECT range AS bucket FROM range(0, 256)),
      |dense AS (
      |  SELECT d.ship_day, d.day_num, r.bucket, c.va, c.vb
      |  FROM days d CROSS JOIN regs r
      |  LEFT JOIN cells c ON c.ship_day = d.ship_day AND c.bucket = r.bucket),
      |w AS (
      |  SELECT ship_day,
      |         min(va) OVER (PARTITION BY bucket ORDER BY day_num
      |                       RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS wa,
      |         min(vb) OVER (PARTITION BY bucket ORDER BY day_num
      |                       RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS wb
      |  FROM dense),
      |u AS (
      |  SELECT ship_day, wa, wb,
      |         CASE WHEN wa IS NULL THEN wb WHEN wb IS NULL THEN wa
      |              WHEN wa < wb THEN wa ELSE wb END AS wu
      |  FROM w),
      |s AS (
      |  SELECT ship_day,
      |         CAST(sum(CASE WHEN wa IS NULL THEN 0 ELSE wa + 1 END) AS BIGINT) AS sa,
      |         CAST(sum(CASE WHEN wa IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN wb IS NULL THEN 0 ELSE wb + 1 END) AS BIGINT) AS sb,
      |         CAST(sum(CASE WHEN wb IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS cb,
      |         CAST(sum(CASE WHEN wu IS NULL THEN 0 ELSE wu + 1 END) AS BIGINT) AS su,
      |         CAST(sum(CASE WHEN wu IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS cu
      |  FROM u GROUP BY 1),
      |e AS (
      |  SELECT ship_day,
      |         ${kmvEstSql("sa", "ca")} AS est_a,
      |         ${kmvEstSql("sb", "cb")} AS est_b,
      |         ${kmvEstSql("su", "cu")} AS est_union
      |  FROM s)
      |SELECT ship_day, est_a, est_b, est_union,
      |       est_a + est_b - est_union AS est_intersect,
      |       (est_a + est_b - est_union) / est_union AS jaccard_est
      |FROM e""".stripMargin

  private val histOracleSql: String =
    """WITH st AS (
      |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi, count(*) AS n
      |  FROM lineitem),
      |h AS (
      |  SELECT least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / CAST(64 AS DOUBLE))) AS BIGINT), 63) AS bucket,
      |         count(*) AS cnt
      |  FROM lineitem, st GROUP BY 1),
      |c AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM h),
      |q AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS quantile)
      |SELECT q.quantile,
      |       lo + (hi - lo) / CAST(64 AS DOUBLE) *
      |         (CAST(c.bucket AS DOUBLE)
      |          + (q.quantile * CAST(n AS DOUBLE) - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)) AS est_value
      |FROM q, c, st
      |WHERE CAST(c.cum AS DOUBLE) >= q.quantile * CAST(n AS DOUBLE)
      |QUALIFY row_number() OVER (PARTITION BY q.quantile ORDER BY c.bucket) = 1""".stripMargin

  private val histGroupedOracleSql: String =
    """WITH st AS (
      |  SELECT l_returnflag, min(l_extendedprice) AS lo,
      |         max(l_extendedprice) AS hi, count(*) AS n
      |  FROM lineitem GROUP BY 1),
      |h AS (
      |  SELECT li.l_returnflag,
      |         least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / CAST(64 AS DOUBLE))) AS BIGINT), 63) AS bucket,
      |         count(*) AS cnt
      |  FROM lineitem li JOIN st ON li.l_returnflag = st.l_returnflag
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, bucket, cnt,
      |         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum
      |  FROM h),
      |q AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS quantile)
      |SELECT c.l_returnflag, q.quantile,
      |       lo + (hi - lo) / CAST(64 AS DOUBLE) *
      |         (CAST(c.bucket AS DOUBLE)
      |          + (q.quantile * CAST(n AS DOUBLE) - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)) AS est_value
      |FROM q, c JOIN st ON c.l_returnflag = st.l_returnflag
      |WHERE CAST(c.cum AS DOUBLE) >= q.quantile * CAST(n AS DOUBLE)
      |QUALIFY row_number() OVER (PARTITION BY c.l_returnflag, q.quantile
      |                           ORDER BY c.bucket) = 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "a3_json_extract" ->
      """SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50""".stripMargin,

    "b1_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.05""".stripMargin,

    "b3_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "b3_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin,

    "b3_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin,

    "b3_join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "b5_agg_basic" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "b6_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_users, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "b8_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       strftime(ws + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
        |       event_type, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM (SELECT e.*, time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS ws
        |      FROM events e, (SELECT unnest([0, 1]) AS k) k) t
        |GROUP BY ws, event_type""".stripMargin,

    "b9_upsert_latest" ->
      """SELECT user_id, event_id, event_type, value,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "b10_date_parts" ->
      """SELECT o_orderkey, year(o_orderdate) AS tx_year, month(o_orderdate) AS tx_month,
        |       day(o_orderdate) AS tx_day
        |FROM orders""".stripMargin,

    "b32_heavy_hitters" ->
      """SELECT l_orderkey, count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 8""".stripMargin,

    // B35: one md5 base hash per key + the affine row family (identical
    // constants to the MinHash oracle), integer cell sums (integer
    // addition is order-independent, so plain GROUP BY sums are safe
    // here — no explicit fold needed, unlike the float oracles).
    "b35_heavy_hitters_cms" -> cmsOracleSql,

    // B35b shares B35's oracle verbatim: cell-wise merge of per-slice
    // integer sketches is exactly the one-shot sketch, so the merged
    // query must reproduce the same result — the equivalence IS the test.
    "b35_cms_merge" -> cmsOracleSql,

    // B36/B36b and B37/B37b each share one oracle: merge-equivalence of
    // the integer sketch state is checked EXACTLY by both queries
    // hash-matching the same SQL.
    "b36_distinct_hll" -> hllOracleSql,
    "b36_hll_merge" -> hllOracleSql,

    // B45: the same cells, densified over days × the 256 register
    // literals, the same RANGE trailing window, the same estimator
    // spelling grouped per day. Window max ignores NULLs on both
    // engines; day numbers are integer date diffs. (A def so the B47
    // error harness composes it verbatim.)
    "b45_window_hll" -> windowHllOracleSql,

    // B47: b45's SQL verbatim as the estimate CTE; the exact side is
    // the same interval sweep (lead per key → ±1 diff events → one
    // ordered running sum — all integers; DuckDB window/agg sums widen
    // to HUGEINT, cast back to BIGINT per §6b).
    "b47_window_hll_error" ->
      s"""WITH est AS (
         |  SELECT ship_day,
         |         date_diff('day', DATE '1970-01-01', ship_day) AS dnum,
         |         est_ndv
         |  FROM ($windowHllOracleSql)),
         |pairs AS (
         |  SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS dn,
         |         l_orderkey AS k
         |  FROM lineitem),
         |iv AS (
         |  SELECT dn AS s,
         |         CASE WHEN nx IS NULL THEN dn + 59
         |              ELSE least(dn + 59, nx - 1) END AS e
         |  FROM (SELECT dn, k, lead(dn) OVER (PARTITION BY k ORDER BY dn) AS nx
         |        FROM pairs)),
         |df AS (
         |  SELECT dnum, CAST(sum(delta) AS BIGINT) AS net FROM (
         |    SELECT s AS dnum, 1 AS delta FROM iv
         |    UNION ALL
         |    SELECT e + 1 AS dnum, -1 AS delta FROM iv)
         |  GROUP BY 1),
         |cnt AS (
         |  SELECT dnum, CAST(sum(net) OVER (ORDER BY dnum) AS BIGINT) AS exact_ndv
         |  FROM df)
         |SELECT e.ship_day, x.exact_ndv, e.est_ndv,
         |       abs(e.est_ndv - CAST(x.exact_ndv AS DOUBLE))
         |         / CAST(x.exact_ndv AS DOUBLE) AS rel_err
         |FROM est e JOIN cnt x ON e.dnum = x.dnum""".stripMargin,

    // B36c: the same register/estimator arithmetic per group.
    "b36_hll_grouped" ->
      """WITH hk AS (
        |  SELECT l_returnflag,
        |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |regs AS (
        |  SELECT l_returnflag, h & 255 AS bucket,
        |         max(53 - length(ltrim(bin(h >> 8), '0'))) AS r
        |  FROM hk GROUP BY l_returnflag, bucket),
        |s AS (
        |  SELECT l_returnflag,
        |         sum(CAST(1 AS BIGINT) << (53 - r)) AS s_present,
        |         count(*) AS registers_set
        |  FROM regs GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
        |       * CAST(65536 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE)
        |       / CAST(s_present + (256 - registers_set) * CAST(9007199254740992 AS BIGINT) AS DOUBLE)
        |         AS est_ndv,
        |       registers_set
        |FROM s""".stripMargin,
    // B46: the same cells on the same global grid, densified over
    // days × the 64 bucket literals, trailing RANGE sum per bucket,
    // then b37's per-day totals/crossing/interpolation spelling.
    // All counts are integer sums (order-free); est_value repeats the
    // histOracleSql op order with the per-day window total as n.
    "b46_window_quantile" ->
      """WITH st AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
        |cells AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_day,
        |         least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / CAST(64 AS DOUBLE))) AS BIGINT), 63) AS bucket,
        |         count(*) AS cnt
        |  FROM lineitem, st GROUP BY 1, 2),
        |days AS (
        |  SELECT DISTINCT ship_day,
        |         date_diff('day', DATE '1970-01-01', ship_day) AS day_num
        |  FROM cells),
        |bks AS (SELECT range AS bucket FROM range(0, 64)),
        |dense AS (
        |  SELECT d.ship_day, d.day_num, b.bucket, c.cnt
        |  FROM days d CROSS JOIN bks b
        |  LEFT JOIN cells c ON c.ship_day = d.ship_day AND c.bucket = b.bucket),
        |wc AS (
        |  SELECT ship_day, bucket,
        |         sum(cnt) OVER (PARTITION BY bucket ORDER BY day_num
        |                        RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS wcnt
        |  FROM dense),
        |f AS (SELECT ship_day, bucket, wcnt FROM wc WHERE wcnt IS NOT NULL),
        |tt AS (
        |  SELECT ship_day, bucket, wcnt,
        |         sum(wcnt) OVER (PARTITION BY ship_day) AS n,
        |         sum(wcnt) OVER (PARTITION BY ship_day ORDER BY bucket) AS cum
        |  FROM f),
        |q AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS quantile)
        |SELECT tt.ship_day, q.quantile,
        |       lo + (hi - lo) / CAST(64 AS DOUBLE) *
        |         (CAST(tt.bucket AS DOUBLE)
        |          + (q.quantile * CAST(tt.n AS DOUBLE) - CAST(tt.cum - tt.wcnt AS DOUBLE)) / CAST(tt.wcnt AS DOUBLE)) AS est_value
        |FROM q, tt, st
        |WHERE CAST(tt.cum AS DOUBLE) >= q.quantile * CAST(tt.n AS DOUBLE)
        |QUALIFY row_number() OVER (PARTITION BY tt.ship_day, q.quantile ORDER BY tt.bucket) = 1""".stripMargin,

    "b37_quantile_hist" -> histOracleSql,
    "b37_hist_merge" -> histOracleSql,
    // B37c/d: histOracleSql with every stage keyed by the group; the
    // merge twin shares it VERBATIM (cell-wise integer addition is
    // exact, the family pattern).
    "b37_hist_grouped" -> histGroupedOracleSql,
    "b37_hist_grouped_merge" -> histGroupedOracleSql,
    // B39: same bigint-to-string leading digit, same nine literal
    // constants CAST AS DOUBLE (a bare DuckDB numeric literal is
    // DECIMAL — §6b round-5 note), same rounded division.
    "b39_benford" ->
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM lineitem),
        |c AS (SELECT digit, count(*) AS cnt FROM dg GROUP BY 1),
        |e AS (SELECT [CAST(0.30103 AS DOUBLE), CAST(0.17609 AS DOUBLE), CAST(0.12494 AS DOUBLE),
        |              CAST(0.09691 AS DOUBLE), CAST(0.07918 AS DOUBLE), CAST(0.06695 AS DOUBLE),
        |              CAST(0.05799 AS DOUBLE), CAST(0.05115 AS DOUBLE), CAST(0.04576 AS DOUBLE)] AS ps),
        |p AS (
        |  SELECT digit, cnt,
        |         round(CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER () AS DOUBLE), 8) AS obs_p,
        |         ps[CAST(digit AS INT)] AS exp_p
        |  FROM c, e)
        |SELECT digit, cnt, obs_p, exp_p, round(abs(obs_p - exp_p), 8) AS abs_dev
        |FROM p""".stripMargin,

    "b40_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "b41_mode_median" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |md AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_count
        |  FROM counts
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, l_quantity) = 1),
        |me AS (
        |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT md.l_returnflag, md.mode_qty, md.mode_count, me.median_qty
        |FROM md JOIN me USING (l_returnflag)""".stripMargin,

    "b42_window_distinct" ->
      """WITH f AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                                      ORDER BY ts, event_id) = 1
        |              THEN 1 ELSE 0 END AS first_occ
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(sum(first_occ) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types
        |FROM f""".stripMargin,

    // B43: c11's exact-decimal moment recipe; identical expression
    // shapes on both sides so the doubles reproduce bit-for-bit.
    "b43_feature_scale" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice AS x
        |  FROM lineitem),
        |st AS (
        |  SELECT l_returnflag, min(x) AS mn, max(x) AS mx, count(*) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sx2
        |  FROM li GROUP BY 1)
        |SELECT l_orderkey, l_linenumber, li.l_returnflag, x,
        |       round((x - mn) / (mx - mn), 8) AS minmax,
        |       round((x - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)), 8) AS zscore,
        |       percent_rank() OVER (PARTITION BY li.l_returnflag ORDER BY x) AS pct_rank
        |FROM li JOIN st ON li.l_returnflag = st.l_returnflag""".stripMargin,

    // B43b: same stats CTE, same floor-bucket rule as b21/c23 (through
    // floor() — the §6b cast rule), exact-integer below-mass ratio.
    "b43_feature_scale_approx" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice AS x
        |  FROM lineitem),
        |st AS (
        |  SELECT l_returnflag, min(x) AS mn, max(x) AS mx, count(*) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sx2
        |  FROM li GROUP BY 1),
        |b AS (
        |  SELECT li.*, mn, mx, n, sx, sx2,
        |         CASE WHEN mx = mn THEN 0
        |              ELSE least(CAST(floor((x - mn) / ((mx - mn) / CAST(128.0 AS DOUBLE))) AS BIGINT), 127)
        |         END AS bucket
        |  FROM li JOIN st ON li.l_returnflag = st.l_returnflag),
        |cells AS (
        |  SELECT l_returnflag, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, bucket,
        |         COALESCE(CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |                  0) AS below
        |  FROM cells)
        |SELECT l_orderkey, l_linenumber, b.l_returnflag, x,
        |       round((x - mn) / (mx - mn), 8) AS minmax,
        |       round((x - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)), 8) AS zscore,
        |       CASE WHEN n > 1 THEN CAST(below AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |            ELSE CAST(0 AS DOUBLE) END AS pct_rank_approx
        |FROM b JOIN cum ON b.l_returnflag = cum.l_returnflag AND b.bucket = cum.bucket""".stripMargin,

    // B44: same islands key (day − row_number), HUGEINT sum cast back.
    "b44_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, day,
        |         day - CAST(row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY day) AS INT) AS grp
        |  FROM days),
        |st AS (
        |  SELECT user_id, grp, count(*) AS streak_len FROM g GROUP BY 1, 2)
        |SELECT user_id, max(streak_len) AS longest_streak,
        |       count(*) AS n_streaks,
        |       CAST(sum(streak_len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY 1""".stripMargin,

    "b38_kmv_distinct" -> kmvOracleSql,
    "b38_kmv_merge" -> kmvOracleSql,
    "b38_kmv_setops" -> kmvSetopsOracleSql,
    "b48_window_kmv" -> windowKmvOracleSql,

    // B49: the same cells → bounded expansion → re-cut, spelled in
    // SQL — md5 ranks are byte-identical across engines (the i12
    // spelling), day windows are integer arithmetic, and the
    // (hk, key) order is a total order (keys unique per fact row), so
    // every rank boundary is deterministic. The BETWEEN join mirrors
    // the engine's explode+equi-join: same (cell serves day) pairs.
    "b49_window_sample" ->
      """WITH f AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_day,
        |         CAST(l_orderkey AS VARCHAR) || ':' ||
        |           CAST(l_linenumber AS VARCHAR) AS key
        |  FROM lineitem),
        |h AS (
        |  SELECT ship_day, key,
        |         CAST(('0x' || substr(md5('wsamp:' || key), 1, 15)) AS BIGINT) AS hk,
        |         datediff('day', DATE '1970-01-01', ship_day) AS day_num
        |  FROM f),
        |cells AS (
        |  SELECT ship_day, day_num, key, hk
        |  FROM h
        |  QUALIFY row_number() OVER (PARTITION BY ship_day ORDER BY hk, key) <= 100),
        |days AS (SELECT DISTINCT ship_day, day_num FROM h),
        |exp AS (
        |  SELECT d.ship_day, c.key, c.hk
        |  FROM cells c JOIN days d
        |    ON d.day_num BETWEEN c.day_num AND c.day_num + 59)
        |SELECT ship_day,
        |       CAST(row_number() OVER (PARTITION BY ship_day
        |                               ORDER BY hk, key) AS BIGINT) AS rk,
        |       key, hk
        |FROM exp
        |QUALIFY rk <= 100""".stripMargin,

    // B50: integer counts end to end — the per-day m-cut, the window
    // sum, and the top-k re-cut all rank on (count desc, key) total
    // orders, so every boundary is deterministic; the BETWEEN join
    // mirrors the engine's explode+equi-join.
    "b50_window_topk" ->
      """WITH f AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_day, l_suppkey AS key
        |  FROM lineitem),
        |dc AS (
        |  SELECT ship_day, key, CAST(count(*) AS BIGINT) AS c,
        |         datediff('day', DATE '1970-01-01', ship_day) AS day_num
        |  FROM f GROUP BY ship_day, key),
        |cells AS (
        |  SELECT ship_day, day_num, key, c
        |  FROM dc
        |  QUALIFY row_number() OVER (PARTITION BY ship_day
        |                             ORDER BY c DESC, key) <= 256),
        |days AS (SELECT DISTINCT ship_day, day_num FROM dc),
        |sums AS (
        |  SELECT d.ship_day, c.key, CAST(sum(c.c) AS BIGINT) AS w_count
        |  FROM cells c JOIN days d
        |    ON d.day_num BETWEEN c.day_num AND c.day_num + 59
        |  GROUP BY d.ship_day, c.key)
        |SELECT ship_day,
        |       CAST(row_number() OVER (PARTITION BY ship_day
        |                               ORDER BY w_count DESC, key) AS BIGINT) AS rk,
        |       key, w_count
        |FROM sums
        |QUALIFY rk <= 10""".stripMargin,

    // I14: lead() over ALL changes stamps each U version's closing ts;
    // the version number ranks U rows only. NULL valid_to survives
    // strftime as NULL in both engines.
    "i14_scd2_history" ->
      """WITH c AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |         CASE WHEN event_id % 10 < 2 THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |l AS (
        |  SELECT *, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            AS valid_to_ts
        |  FROM c),
        |u AS (SELECT * FROM l WHERE op = 'U')
        |SELECT user_id, event_id, event_type, value,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS version,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |       valid_to_ts IS NULL AS is_current
        |FROM u""".stripMargin,

    "i7_cdc_apply" ->
      """WITH c AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |         CASE WHEN event_id % 10 < 2 THEN 'D' ELSE 'U' END AS op
        |  FROM events)
        |SELECT user_id, event_id, event_type, value,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts, op
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |                           ORDER BY ts DESC, event_id DESC) = 1
        |        AND op <> 'D'""".stripMargin,

    "b31_funnel" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_type,
        |         min(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id) AS view_ts
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, event_type, view_ts,
        |         min(CASE WHEN event_type = 'click' AND ts > view_ts THEN ts END)
        |           OVER (PARTITION BY user_id) AS click_ts
        |  FROM v),
        |p AS (
        |  SELECT user_id, view_ts, click_ts,
        |         min(CASE WHEN event_type = 'purchase' AND ts > click_ts THEN ts END)
        |           OVER (PARTITION BY user_id) AS purchase_ts
        |  FROM c)
        |SELECT DISTINCT user_id,
        |       strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |       strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       CASE WHEN purchase_ts IS NOT NULL THEN 'purchase'
        |            WHEN click_ts IS NOT NULL THEN 'click'
        |            WHEN view_ts IS NOT NULL THEN 'view'
        |            ELSE 'none' END AS stage
        |FROM p""".stripMargin,

    "b30_gapfill" ->
      """WITH span AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        |days AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |dims AS (SELECT DISTINCT o_orderpriority FROM orders),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_sales,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT strftime(days.day, '%Y-%m-%d') AS day, dims.o_orderpriority,
        |       coalesce(daily.day_sales, CAST(0.0 AS DOUBLE)) AS day_sales,
        |       coalesce(daily.n_orders, CAST(0 AS BIGINT)) AS n_orders
        |FROM days CROSS JOIN dims
        |LEFT JOIN daily ON days.day = daily.day
        |               AND dims.o_orderpriority = daily.o_orderpriority""".stripMargin,

    "i4_load_diff" ->
      """WITH load1 AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |load2 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderstatus
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |            WHEN n.o_orderkey IS NULL THEN 'removed'
        |            WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |              OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus) THEN 'changed'
        |            ELSE 'unchanged' END AS change_type,
        |       CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        |            THEN concat_ws(',',
        |              CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |                   THEN 'o_totalprice' END,
        |              CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |                   THEN 'o_orderstatus' END)
        |            ELSE '' END AS changed_cols
        |FROM load1 o FULL OUTER JOIN load2 n ON o.o_orderkey = n.o_orderkey
        |WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |           WHEN n.o_orderkey IS NULL THEN 'removed'
        |           WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |             OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus) THEN 'changed'
        |           ELSE 'unchanged' END <> 'unchanged'""".stripMargin,

    "b11_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |       lag(o_totalprice, 1) OVER
        |              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_total
        |FROM orders""".stripMargin,

    "b11_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey
        |                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM orders
        |QUALIFY rnk <= 3""".stripMargin,

    "b34_bloom_prejoin" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "b34_semi_plain" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "b33_event_gaps" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_gap_us,
        |         lead(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |       prev_gap_us, next_type,
        |       (prev_gap_us IS NULL OR prev_gap_us > 1800000000) AS is_new_session
        |FROM w""".stripMargin,

    "b12_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "b13_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    // Session semantics mirror Spark's session_window: an event extends
    // the session when it arrives strictly inside [start, last + gap);
    // window_end = last event + gap.
    "b16_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
        |       user_id, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,

    "b17_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 1995) AS DOUBLE) AS "1995",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 1996) AS DOUBLE) AS "1996",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 1997) AS DOUBLE) AS "1997",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 1998) AS DOUBLE) AS "1998",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 1999) AS DOUBLE) AS "1999",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 2000) AS DOUBLE) AS "2000",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE year(o_orderdate) = 2001) AS DOUBLE) AS "2001"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "b18_conditional_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       count(CASE WHEN o_totalprice > 250000 THEN 1 END) AS n_large,
        |       CAST(SUM(CAST(CASE WHEN o_totalprice > 250000 THEN o_totalprice ELSE 0 END
        |                     AS DECIMAL(18,2))) AS DOUBLE) AS large_value,
        |       CAST(count(CASE WHEN o_totalprice > 250000 THEN 1 END) AS DOUBLE) / count(*) AS large_share
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "b24_ntile" ->
      """WITH totals AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, total_spent,
        |       ntile(4) OVER (ORDER BY total_spent DESC, o_custkey) AS quartile,
        |       percent_rank() OVER (ORDER BY total_spent DESC, o_custkey) AS pct_rank
        |FROM totals""".stripMargin,

    "b19_quantiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "b20_corr" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sx2,
        |         CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,12))) AS DOUBLE) AS sy2
        |  FROM lineitem)
        |SELECT n, round((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
        |               7) AS corr_price_discount
        |FROM m""".stripMargin,

    "b21_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
        |       count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM lineitem GROUP BY 1""".stripMargin,

    "b22_asof_join" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |       o_orderkey AS last_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
        |FROM (SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |             row_number() OVER (PARTITION BY e.event_id
        |                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |      FROM events e LEFT JOIN orders o
        |        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1""".stripMargin,

    "b23_range_join" ->
      """WITH months AS (
        |  SELECT DISTINCT date_trunc('month', ts) AS month_start,
        |         date_trunc('month', ts) + INTERVAL '1 month' AS month_end
        |  FROM events)
        |SELECT strftime(month_start, '%Y-%m-%d %H:%M:%S') AS month_start,
        |       event_type, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events e JOIN months m
        |  ON e.ts >= m.month_start AND e.ts < m.month_end
        |GROUP BY m.month_start, event_type""".stripMargin,

    "b14_cube" ->
      """SELECT tx_year, o_orderstatus, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT year(o_orderdate) AS tx_year, o_orderstatus, o_totalprice FROM orders) t
        |GROUP BY CUBE(tx_year, o_orderstatus)""".stripMargin,

    "b14_rollup" ->
      """SELECT tx_year, o_orderpriority, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT year(o_orderdate) AS tx_year, o_orderpriority, o_totalprice FROM orders) t
        |GROUP BY ROLLUP(tx_year, o_orderpriority)""".stripMargin,

    "b15_union_dedup" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |UNION
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'""".stripMargin,

    "b25_setops" ->
      """WITH a AS (SELECT o_orderkey, o_orderstatus FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |     b AS (SELECT o_orderkey, o_orderstatus FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |SELECT o_orderkey, o_orderstatus, 'both' AS src FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t1
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, 'first_only' AS src FROM (SELECT * FROM a EXCEPT SELECT * FROM b) t2""".stripMargin
  )
}
