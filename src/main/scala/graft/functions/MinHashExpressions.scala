package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native k-permutation MinHash signature over a shingle array.
  *
  * Value-identical to the composable form (Dedup.minhashes ∘
  * Dedup.shingleHashes): h = md5-prefix60(shingle) mod P, then
  * sig[i] = min over shingles of ((a_i·h + b_i) mod P) with
  * a_i = (i·2654435761 + 1) mod P, b_i = i·40503 + 17, P = 2³¹−1 —
  * and therefore identical to the DuckDB oracle.
  *
  * The composable form walks the shingle array k+1 times through
  * interpreted lambda closures (one boxed Long per element per
  * permutation); this walks it ONCE, hashing each shingle a single time
  * and updating k primitive accumulators. Empty input yields k nulls —
  * exactly what the composable form produces (array_min over an empty
  * slice is null) — so the two forms agree on ALL inputs, not just the
  * ≥3-token-filtered ones.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val acc = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = Md5Prefix60.hash60(shingles.getUTF8String(j)) % P
      var i = 0
      while (i < k) {
        val v = (((i * 2654435761L + 1L) % P) * h + (i * 40503L + 17L)) % P
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }
}

object MinHashFunctions {
  /** Native MinHash signature (see [[MinHashSig]]). */
  def minhashSig(shingles: Column, k: Int = 16): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(shingles), k))
}
