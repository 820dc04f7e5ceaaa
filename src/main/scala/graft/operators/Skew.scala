package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
