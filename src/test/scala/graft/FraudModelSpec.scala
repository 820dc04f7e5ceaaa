package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Fraud, FraudModel}

/** MLlib risk model sanity (batch DataFrame + MLlib capability). */
class FraudModelSpec extends AnyFunSuite with SparkTestBase {

  test("C13 learned score separates rule-flagged transactions") {
    val scored = Fraud.scoredTransactions(spark, SF)
    val model = FraudModel.train(scored)
    val out = FraudModel.score(model, scored)
      .select("fraud_score", "model_score").collect()
    val hot = out.filter(_.getDouble(0) >= 1.0).map(_.getDouble(1))
    val cold = out.filter(_.getDouble(0) === 0.0).map(_.getDouble(1))
    assert(hot.nonEmpty && cold.nonEmpty)
    val hotAvg = hot.sum / hot.length
    val coldAvg = cold.sum / cold.length
    assert(hotAvg > coldAvg + 0.2,
      s"model failed to separate: hot=$hotAvg cold=$coldAvg")
    assert(out.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("C13b portable GD risk model separates the classes like the MLlib one") {
    // the round-12 oracle twin (linear probability model, 3 fixed GD
    // iterations, quantized integer gradient sums): record that the
    // portable training actually LEARNED — class separation on the
    // same read-out the C13 test uses, and AUC beside MLlib's.
    val scored = Fraud.scoredTransactions(spark, SF)
    val out = FraudModel.queries("c13b_risk_score_gd")(spark, SF)
      .select("fraud_score", "model_score").collect()
    val hot = out.filter(_.getDouble(0) >= 1.0).map(_.getDouble(1))
    val cold = out.filter(_.getDouble(0) === 0.0).map(_.getDouble(1))
    assert(hot.nonEmpty && cold.nonEmpty)
    val hotAvg = hot.sum / hot.length
    val coldAvg = cold.sum / cold.length
    info(f"GD separation: hot $hotAvg%.3f vs cold $coldAvg%.3f")
    assert(hotAvg > coldAvg + 0.2,
      s"GD model failed to separate: hot=$hotAvg cold=$coldAvg")
    assert(out.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    // AUC on the rule label, recorded beside MLlib's (both in-sample
    // here; C14 owns the held-out protocol)
    val gdAuc = FraudModel.evaluate(
      FraudModel.queries("c13b_risk_score_gd")(spark, SF)
        .withColumn("label", org.apache.spark.sql.functions
          .when(org.apache.spark.sql.functions.col("fraud_score") >= 1.0, 1.0)
          .otherwise(0.0)))
    info(f"GD in-sample AUC on the rule label: $gdAuc%.3f")
    assert(gdAuc > 0.9, s"portable GD AUC $gdAuc should separate rule labels")
  }

  test("C14 held-out AUC beats chance by a wide margin on the rule label") {
    // genuine held-out split: train on the hash-assigned train rows,
    // evaluate on the disjoint val+test rows
    val scored = graft.operators.Profile.splitAssign(
      graft.operators.Fraud.scoredTransactions(spark, SF), "transaction_id")
    val train = scored.filter(org.apache.spark.sql.functions.col("split") === "train")
    val heldOut = scored.filter(org.apache.spark.sql.functions.col("split") =!= "train")
    val model = graft.operators.FraudModel.train(train)
    val auc = graft.operators.FraudModel.evaluate(
      graft.operators.FraudModel.score(model, heldOut))
    assert(auc > 0.95, s"held-out AUC $auc — the learned weighting should separate rule labels")
  }

  test("E3 IVF ANN probes a bounded set of cells and ranks by cosine") {
    val e = graft.sources.Tables.table(spark, SF, "embeddings")
    val ivf = graft.operators.Similarity.ivfTopK(e, 0L, 20).collect()
    assert(ivf.length <= 20 && ivf.nonEmpty)
    // probed at most nProbes distinct cells
    assert(ivf.map(_.getAs[Int]("cell")).distinct.length <= 2)
    val scores = ivf.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
