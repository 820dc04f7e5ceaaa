package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Fraud, FraudModel, Multimodal, Profile, Relational, Similarity, Skew, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full enrichment + rule-scoring pipeline (SURVEY §2 C1–C5).
    */
  def entry(spark: SparkSession): DataFrame =
    Fraud.scoredTransactions(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Fraud.queries ++ FraudModel.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Profile.queries ++ Skew.queries

  /** DuckDB-equivalent SQL per query; any `queries` key absent here is
    * not SQL-expressible (sketches, ML, ANN, multimodal stubs) and gets
    * the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Fraud.oracles ++ FraudModel.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      Profile.oracles ++ Skew.oracles
}
