package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc steady-state timing of named queries (one untimed warm-up
  * pass, then one measured pass through the noop sink — the Bench
  * protocol without the full headline):
  * runMain graft.tools.TimeOne <sfDir> <name,name,...>
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm-up: codegen + JIT
    names.foreach(n => println(f"$n%-30s ${once(n)}%8.3f s"))
    spark.stop()
  }
}
