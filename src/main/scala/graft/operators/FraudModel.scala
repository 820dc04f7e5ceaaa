package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib risk model on top of the rule features — the "batch DataFrame +
  * MLlib" leg of the pipeline: the reference scores fraud with fixed
  * rules (src/spark/jobs/spark.py fraud_score); this learns a weighting
  * of the same features so the score generalizes past the hand-tuned
  * 0.5/0.5 split.
  *
  * Scale: VectorAssembler + LogisticRegression both run as distributed
  * DataFrame transforms; training is a handful of passes over the
  * feature columns (L-BFGS), scoring is one map-side transform —
  * nothing is collected to the driver beyond the coefficient vector.
  */
object FraudModel {

  val featureCols: Seq[String] =
    Seq("country_mismatch", "high_value_flag", "amount", "discount_missing")

  /** Feature frame from the scored transactions: the two rule flags, the
    * raw amount, and a missing-dimension indicator (null discount ⇒ the
    * enrichment didn't find the product — itself a risk signal).
    */
  def features(scored: DataFrame): DataFrame =
    scored
      .withColumn("discount_missing",
        when(col("discounted_price").isNull, 1.0).otherwise(0.0))
      .withColumn("label",
        when(col("fraud_score") >= 1.0, 1.0).otherwise(0.0))

  def assemble(df: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features_vec")
      .transform(df)

  /** Deterministic training run (fixed solver iterations, no sampling). */
  def train(scored: DataFrame): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features_vec")
      .setLabelCol("label")
      .setMaxIter(25)
      .setRegParam(0.01)
      .fit(assemble(features(scored)))

  /** Attach the model's fraud probability as `model_score`
    * (vector_to_array element access — no UDF in the scoring path).
    */
  def score(model: LogisticRegressionModel, scored: DataFrame): DataFrame =
    model.transform(assemble(features(scored)))
      .withColumn("model_score",
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
      .drop("features_vec", "rawPrediction", "probability", "prediction")

  /** Area under the ROC curve of `model_score` against the `label`
    * column that [[score]] output already carries (defined once, in
    * [[features]]). The evaluator is a distributed computation over
    * (score, label) pairs; pass a frame the model did NOT train on for
    * a held-out number (see FraudModelSpec C14).
    */
  def evaluate(scoredWithModel: DataFrame): Double =
    new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("model_score")
      .setLabelCol("label")
      .setMetricName("areaUnderROC")
      .evaluate(scoredWithModel)

  /** Train on the scored batch and score it — the batch-ML capability
    * as a single queryable operator (rows-only: solver internals have
    * no SQL twin).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_ml_risk_score" -> ((s, d) => {
      val scored = Fraud.scoredTransactions(s, d)
      score(train(scored), scored)
        .select("transaction_id", "fraud_score", "model_score")
    })
  )
}
