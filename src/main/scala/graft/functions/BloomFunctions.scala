package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal Bloom-filter expressions — the
  * same machinery `InjectRuntimeFilter` uses when it decides to inject a
  * runtime row filter, exposed so a pipeline can apply the pattern
  * DELIBERATELY: build a compact filter over the (filtered) dim keys,
  * broadcast it as a literal, and prune the 100 TB fact side at scan
  * time — BEFORE the join shuffle — with the exact join afterwards
  * removing the bounded false positives. Catalyst only auto-injects
  * this when its size/selectivity thresholds align; the explicit form
  * guarantees it for loads where the dim side is known-selective.
  *
  * Values are hashed with XxHash64 on BOTH the build and probe side,
  * matching InjectRuntimeFilter's convention.
  */
object BloomFunctions {

  /** Aggregate a column's values into a serialized Bloom filter
    * (BinaryType). `expectedItems`/`numBits` size the sketch — ~7.2
    * bits/item gives ~3% false positives.
    */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftShims.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftShims.expression(c))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a Bloom filter built by [[bloomFilterAgg]].
    * `bloom` must be foldable (a `lit(bytes)` of the collected sketch —
    * a bounded driver value, like broadcast model state).
    */
  def mightContain(bloom: Column, c: Column): Column =
    GraftShims.column(
      BloomFilterMightContain(
        GraftShims.expression(bloom),
        new XxHash64(Seq(GraftShims.expression(c)))))
}
