package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fraud

/** Rule-scoring semantics on hand-built rows (SURVEY §2 C2–C5): the
  * reference's exact null/flag behavior (src/spark/jobs/spark.py).
  */
class FraudSpec extends AnyFunSuite with SparkTestBase {

  private def scoredOf(userCountry: String, productCountry: String,
                       amount: Double, basePrice: java.lang.Double,
                       discount: java.lang.Double) = {
    import spark.implicits._
    val df = Seq((userCountry, productCountry, amount, basePrice, discount))
      .toDF("user_country", "product_country", "amount", "base_price", "discount")
    Fraud.score(df).collect()(0)
  }

  test("C2 country mismatch flags only differing countries") {
    assert(scoredOf("FRANCE", "KENYA", 1.0, 1.0, 0.0).getAs[Int]("country_mismatch") === 1)
    assert(scoredOf("FRANCE", "FRANCE", 1.0, 1.0, 0.0).getAs[Int]("country_mismatch") === 0)
  }

  test("C2 null country does NOT flag (reference otherwise(0) semantics)") {
    assert(scoredOf(null, "KENYA", 1.0, 1.0, 0.0).getAs[Int]("country_mismatch") === 0)
  }

  test("C3/C4 high value flag and weighted score") {
    val r = scoredOf("FRANCE", "KENYA", Fraud.HighValueThreshold + 1, 1.0, 0.0)
    assert(r.getAs[Int]("high_value_flag") === 1)
    assert(r.getAs[Double]("fraud_score") === 1.0)
    val r2 = scoredOf("FRANCE", "FRANCE", 1.0, 1.0, 0.0)
    assert(r2.getAs[Double]("fraud_score") === 0.0)
  }

  test("C5 discounted price null-guards like the reference") {
    assert(scoredOf("A", "B", 1.0, 100.0, 0.1).getAs[Double]("discounted_price") === 90.0)
    assert(scoredOf("A", "B", 1.0, null, 0.1).isNullAt(
      scoredOf("A", "B", 1.0, null, 0.1).fieldIndex("discounted_price")))
  }

  test("C1 enrichment keeps every transaction (left outer)") {
    val tx = Fraud.transactions(spark, SF).count()
    val enriched = Fraud.queries("c1_fraud_enrich")(spark, SF).count()
    assert(tx === enriched)
  }

  test("C1 enrichment plan broadcasts the dimensions") {
    val plan = Fraud.queries("c1_fraud_enrich")(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
