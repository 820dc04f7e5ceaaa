package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (getOrCreate-cached). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
}

trait SparkTestBase {
  lazy val spark: SparkSession = TestSpark.spark
  val SF: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
