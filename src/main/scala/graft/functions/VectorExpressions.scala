package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns — the
  * similarity-search hot path.
  *
  * The composable form (`zip_with` + `aggregate`) is evaluated by the
  * interpreted higher-order-function machinery: one closure call and one
  * boxed Float per element per row. This expression generates a tight
  * primitive Java loop inside WholeStageCodegen instead — the
  * tier-(b) escalation (custom Catalyst `Expression` with `doGenCode`)
  * for when built-in operators can't express the performance, per the
  * preference order native Expression > Scala UDF.
  *
  * Semantics: left-to-right accumulation in double precision — the exact
  * fold order of `aggregate(zip_with(a, b, (x, y) -> double(x) *
  * double(y)), 0d, (acc, v) -> acc + v)`, and of the DuckDB oracle's
  * `list_reduce` — so swapping it into an oracle query is bit-neutral.
  * Assumes equal-length arrays with no null elements (embedding tables);
  * null *columns* propagate as usual.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVecDot]]'s mixed-width sibling: `array<float>` (corpus
  * vector) × `array<double>` (a LEARNED centroid — Lloyd means are
  * doubles). Same left-to-right double-precision fold, so the DuckDB
  * `list_reduce` over `CAST(emb[i] AS DOUBLE) * cemb[i]` is bit-equal.
  */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> x array<double> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_double_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleVecDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd `array<float>` dot product (see [[FloatVecDot]]). */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(FloatVecDot(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Codegen'd `array<float>` × `array<double>` dot product (see
    * [[FloatDoubleVecDot]]).
    */
  def vecDotD(a: Column, b: Column): Column =
    GraftShims.column(FloatDoubleVecDot(
      GraftShims.expression(a), GraftShims.expression(b)))
}
