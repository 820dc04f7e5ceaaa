package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders.
  *
  * Money/measure aggregation goes through an exact decimal sum and is cast
  * back to double at the end: decimal addition is associative/commutative,
  * so the result is independent of partitioning and task order — the same
  * value on 1 core or 1000 executors, and bit-identical to any other
  * engine (the DuckDB oracle) using the same pattern. A raw double sum
  * would drift with accumulation order at scale.
  */
object Cols {
  /** Exact order-independent sum for 2-decimal money columns. */
  def dsum2(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact order-independent sum for finer-grained measures. */
  def dsum6(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Window-bound formatting used by every trend query
    * (reference: src/spark/jobs/spark.py date_format of window.start/end).
    */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
