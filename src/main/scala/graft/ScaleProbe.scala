package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-diagnosis main (round-13 verdict item 3): for each named
  * SparkEntry query, run it at a scale dir and report the quantities
  * that EXPLAIN a scaling exponent instead of guessing at it —
  * rows in / rows out / shuffle bytes written (the plan's own
  * SQLMetrics, via [[Bench.shuffleWriteMb]]) / shuffle bytes per input
  * row, plus the corpus's own text-volume stats (docs, total token
  * count, total text bytes) so a super-linear TIME exponent can be
  * attributed to super-linear BYTES (the sf1 generator lengthens every
  * token with variable suffixes — row count alone under-measures the
  * work a text operator does per decade).
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <query> [query ...]
  * Prints one JSON line per query.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // corpus text volume: the denominator a text operator's work
    // actually rides (bytes/tokens), beside the row count
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    // coalesce: SUM over an empty table is NULL, and getLong would
    // throw before the guarded ratios ever ran
    val vol = docs.agg(
      count(lit(1)).as("docs"),
      coalesce(sum(length(col("text"))), lit(0L)).as("text_bytes"),
      coalesce(sum(size(split(col("text"), " "))), lit(0L)).as("tokens")).head()
    println(s"""{"sf":"$sfDir","docs":${vol.getLong(0)},""" +
      s""""text_bytes":${vol.getLong(1)},"tokens":${vol.getLong(2)}}""")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          // rows_out comes from the SAME execution as the metrics
          // (round-14 advice: a follow-up count() re-executed the whole
          // query, inflating the probe's wall time)
          val (mb, out) = Bench.shuffleWriteMbAndRows(df)
          val secs = (System.nanoTime() - t0) / 1e9
          // guarded denominators: an empty documents table must emit
          // valid JSON (-1 sentinel), never Infinity/NaN
          def perUnit(den: Long): String =
            if (den > 0) num(mb * 1e6 / den) else "-1"
          println(s"""{"query":"$name","sf":"$sfDir",""" +
            s""""shuffle_mb":${num(mb)},"rows_out":$out,""" +
            s""""secs_with_collect":${num(secs)},""" +
            s""""shuffle_bytes_per_doc":${perUnit(vol.getLong(0))},""" +
            s""""shuffle_bytes_per_text_byte":${perUnit(vol.getLong(1))}}""")
      }
    }
    spark.stop()
  }
}
