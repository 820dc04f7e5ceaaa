package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** Native codegen'd ADC gather-sum — the PQ scoring hot path:
  * Σ_s tab[s][codes[s]], the asymmetric-distance table lookup every
  * ADC consumer (e8/e15/e16/e17/e22) folds per candidate row.
  *
  * The composable form (`aggregate(sequence(0, S-1), 0d, (acc, s) ->
  * acc + element_at(element_at(tab, s+1), codes[s+1]+1))`) runs in the
  * interpreted HOF machinery: a closure call, two element_at
  * dispatches and boxing per subspace per row — measured ~35 s for the
  * 256-query batch join's exploded candidates at sf1 (the round-14
  * verdict's e17 item), where this expression's tight generated loop
  * is ~100× cheaper per row. Same tier-(b) escalation as
  * [[FloatVecDot]].
  *
  * Semantics: left-to-right double accumulation over `codes`' indices
  * — bit-identical to the HOF fold it replaces and to the oracle's
  * `list_reduce` over `dot_tab[s+1][codes[s+1]+1]`, so swapping it
  * under an oracled query is hash-neutral. `tab` is
  * `array<array<double>>` (subspace-major), `codes` is the 0-based
  * `array<int>` PQ code word; equal lengths and in-range codes are the
  * encode stage's contract (like the vec-dot length contract).
  */
case class AdcGatherSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<array<double>> x array<int> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_gather_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < n) {
      acc += tab.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $b.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  $acc += $a.getArray($s).getDouble($b.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcGatherSum =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd PQ encoder — the codebook argmin that turns one
  * `array<float>` embedding into its `array<int>` PQ code word:
  * codes[s] = first-argmin over c of (nsq[s][c] − 2·dot(emb_s, book[s][c])).
  *
  * The composable form was three stacked projections (slice subvectors
  * → 16-entry distance arrays → array_position/array_min argmin), all
  * interpreted HOF/array machinery: measured ~250 µs per ROW at sf1 —
  * the dominant cost of every PQ consumer (e8/e15/e16/e17/e22/e25/e26)
  * and most of the round-14 verdict's 38.8 s e17 reading. This
  * generates one tight nested loop (S × C × sub fused multiply-adds,
  * no allocations until the final code array).
  *
  * Bit-parity contract (oracle-hash-neutral): the inner dot is
  * [[FloatVecDot]]'s left-to-right (double)float×(double)float fold
  * over the SAME subvector slicing; the distance is the same
  * `nsq − 2.0·dot` IEEE expression; ties take the LOWEST centroid
  * index exactly like `array_position(d, array_min(d))`. Children 2/3
  * are the codebook literals: `book` as `array<array<array<float>>>`
  * (subspace-major, float-rounded like the old per-centroid literals)
  * and `nsq` as `array<array<double>>` (the exact-double ‖c‖² table).
  * Subspace count and subvector width derive from the literal shapes;
  * equal-length/shape inputs are the caller's contract.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (e, b, n) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> x array<array<array<float>>> " +
            s"x array<array<double>> inputs, got $e / $b / $n")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(embAny: Any, bookAny: Any, nsqAny: Any): Any = {
    val emb = embAny.asInstanceOf[ArrayData]
    val book = bookAny.asInstanceOf[ArrayData]
    val nsq = nsqAny.asInstanceOf[ArrayData]
    val nS = book.numElements()
    val codes = new Array[Int](nS)
    var s = 0
    while (s < nS) {
      val cents = book.getArray(s)
      val nsqS = nsq.getArray(s)
      val nC = cents.numElements()
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < nC) {
        val cent = cents.getArray(c)
        val sub = cent.numElements()
        var acc = 0.0
        var d = 0
        while (d < sub) {
          acc += emb.getFloat(s * sub + d).toDouble * cent.getFloat(d).toDouble
          d += 1
        }
        val dist = nsqS.getDouble(c) - 2.0 * acc
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, book, nsq) => {
      val nS = ctx.freshName("nS")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val cents = ctx.freshName("cents")
      val nsqS = ctx.freshName("nsqS")
      val cent = ctx.freshName("cent")
      val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val codes = ctx.freshName("codes")
      s"""
         |final int $nS = $book.numElements();
         |final int[] $codes = new int[$nS];
         |for (int $s = 0; $s < $nS; $s++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cents = $book.getArray($s);
         |  org.apache.spark.sql.catalyst.util.ArrayData $nsqS = $nsq.getArray($s);
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $cents.numElements(); $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $cents.getArray($c);
         |    final int $sub = $cent.numElements();
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      $acc += ((double) $emb.getFloat($s * $sub + $d)) * ((double) $cent.getFloat($d));
         |    }
         |    final double $dist = $nsqS.getDouble($c) - 2.0 * $acc;
         |    if ($dist < $best) { $best = $dist; $bestC = $c; }
         |  }
         |  $codes[$s] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native codegen'd IVF cell routing — the cosine argmax that assigns a
  * row's `array<float>` embedding to its nearest centroid:
  * cell = first-argmax over c of dot(emb, book[c]) / (nrm · cnrms[c]).
  *
  * The composable form (an `array(...)` of 16 per-centroid cosine
  * Columns, then `array_position(cs, array_max(cs)) − 1`) was fine as
  * a pure projection, but every IVF consumer FILTERS on the derived
  * cell (`.filter(col("cell").isin(probeCells))`), and predicate
  * pushdown inlines the whole 16-cosine tree into the Filter below the
  * projection — measured 6.8 s vs the projection's own 0.2 s at sf1
  * (the §6b derived-column-filter class; it made e3/e15/e17 each
  * ~8 s). This expression makes the routing ~1 µs/row, so even the
  * pushed re-evaluation is free — the trade the ivfPqTopK doc accepts
  * (route twice to prune the heavier encode) now actually costs what
  * it claims.
  *
  * Bit-parity contract: the dot is the [[FloatVecDot]] /
  * [[FloatDoubleVecDot]] left-to-right double fold (the book may carry
  * float seeds or double Lloyd means — element type is taken from the
  * child's type); the score is the same `dot / (nrm · cnrm)` IEEE
  * expression; ties take the LOWEST cell exactly like
  * `array_position(cs, array_max(cs))`. Children: embedding
  * `array<float>`, row norm `double`, book `array<array<float|double>>`
  * (a literal), centroid norms `array<double>` (a literal, same order).
  */
case class CellRoute(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def bookIsDouble: Boolean = third.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), DoubleType,
            ArrayType(ArrayType(FloatType | DoubleType, _), _),
            ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (e, n, b, cn) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> x double x " +
            s"array<array<float|double>> x array<double> inputs, " +
            s"got $e / $n / $b / $cn")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "cell_route"

  override def nullSafeEval(embAny: Any, nrmAny: Any, bookAny: Any,
                            cnAny: Any): Any = {
    val emb = embAny.asInstanceOf[ArrayData]
    val nrm = nrmAny.asInstanceOf[Double]
    val book = bookAny.asInstanceOf[ArrayData]
    val cns = cnAny.asInstanceOf[ArrayData]
    val isD = bookIsDouble
    val nC = book.numElements()
    var best = Double.NegativeInfinity
    var bestC = 0
    var c = 0
    while (c < nC) {
      val cent = book.getArray(c)
      val n = cent.numElements()
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += emb.getFloat(d).toDouble *
          (if (isD) cent.getDouble(d) else cent.getFloat(d).toDouble)
        d += 1
      }
      val s = acc / (nrm * cns.getDouble(c))
      if (s > best) { best = s; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, nrm, book, cns) => {
      val nC = ctx.freshName("nC")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val getter =
        if (bookIsDouble) s"$cent.getDouble($d)"
        else s"((double) $cent.getFloat($d))"
      s"""
         |final int $nC = $book.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bestC = 0;
         |for (int $c = 0; $c < $nC; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $book.getArray($c);
         |  final int $n = $cent.numElements();
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += ((double) $emb.getFloat($d)) * $getter;
         |  }
         |  final double $s = $acc / ($nrm * $cns.getDouble($c));
         |  if ($s > $best) { $best = $s; $bestC = $c; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): CellRoute =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
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

  /** Codegen'd ADC table gather-sum Σ_s tab[s][codes[s]] (see
    * [[AdcGatherSum]]).
    */
  def adcSum(tab: Column, codes: Column): Column =
    GraftShims.column(AdcGatherSum(
      GraftShims.expression(tab), GraftShims.expression(codes)))

  /** Codegen'd PQ codebook argmin encode (see [[PqEncode]]). */
  def pqEncode(emb: Column, book: Column, nsq: Column): Column =
    GraftShims.column(PqEncode(
      GraftShims.expression(emb), GraftShims.expression(book),
      GraftShims.expression(nsq)))

  /** Codegen'd IVF cosine-argmax cell routing (see [[CellRoute]]). */
  def cellRoute(emb: Column, nrm: Column, book: Column, cnrms: Column): Column =
    GraftShims.column(CellRoute(
      GraftShims.expression(emb), GraftShims.expression(nrm),
      GraftShims.expression(book), GraftShims.expression(cnrms)))
}
