package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL. On a cluster: `--conf spark.sql.extensions=
  * graft.functions.GraftSparkExtensions`. For an existing session
  * (notebooks, the driver's own session): `GraftFunctions.register`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (c: Seq[Expression]) => FloatVecDot(c(0), c(1))),
    (FunctionIdentifier("adc_gather_sum"),
      new ExpressionInfo(classOf[AdcGatherSum].getName, "adc_gather_sum"),
      (c: Seq[Expression]) => AdcGatherSum(c(0), c(1))),
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (c: Seq[Expression]) => PqEncode(c(0), c(1), c(2))),
    (FunctionIdentifier("cell_route"),
      new ExpressionInfo(classOf[CellRoute].getName, "cell_route"),
      (c: Seq[Expression]) => CellRoute(c(0), c(1), c(2), c(3))),
    (FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (c: Seq[Expression]) => Md5Prefix60(c.head)),
    (FunctionIdentifier("hll_rho52"),
      new ExpressionInfo(classOf[HllRho52].getName, "hll_rho52"),
      (c: Seq[Expression]) => HllRho52(c.head)),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (c: Seq[Expression]) => {
        require(c.size == 1 || c.size == 2,
          s"minhash_sig expects (shingles[, k]), got ${c.size} arguments")
        val k =
          if (c.size == 1) 16
          else {
            require(c(1).foldable, "minhash_sig: k must be an integer literal")
            c(1).eval(null) match {
              case n: Number if n.intValue > 0 => n.intValue
              case other => throw new IllegalArgumentException(
                s"minhash_sig: k must be a positive integer literal, got $other")
            }
          }
        MinHashSig(c(0), k)
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      GraftShims.registerFunction(spark, id.funcName, builder)
    }
}
