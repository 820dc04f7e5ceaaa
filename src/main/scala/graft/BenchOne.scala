package graft

import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timer for in-round measurements (not the driver
  * surface — graft.Bench is). Usage: BenchOne <sfDir> <reps> <q1> [q2...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val reps = args(1).toInt
    for (n <- args.drop(2)) {
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%s reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
