package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (not part of the library surface). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args(0) == "--all") {
      // plan-size census over the whole query surface: name, chars of
      // the pre-execution physical plan (no collect — AQE unfinalized)
      val sizes = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            val n = fn(spark, args(1)).queryExecution.executedPlan.toString.length
            Some(name -> n)
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
              None
          }
      }
      sizes.sortBy(-_._2).foreach { case (n, s) => println(f"$s%9d  $n") }
    } else {
      val df = SparkEntry.queries(args(0))(spark, args(1))
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        fin.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"plan chars: ${fin.length}")
    }
    spark.stop()
  }
}
