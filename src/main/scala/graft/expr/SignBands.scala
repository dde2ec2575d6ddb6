package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression computing banded sign-LSH values: band `b`'s
  * bit `j` is `(v[p] > v[q]) ? 1 : 0` for a fixed coordinate pair drawn
  * from `pairs` (flattened `p0,q0,p1,q1,…`, one pair per bit, row-major by
  * band). Output is an `array<int>` of `bands` values, each in
  * `[0, 2^bitsPerBand)`.
  *
  * Why an expression and not SQL: the equivalent projection unrolls
  * `bands × bitsPerBand` literal `CASE WHEN element_at(...)` terms — at
  * 32×16 = 512 terms the generated Java method exceeds Janino's 64 KB
  * limit, whole-stage codegen fails to compile, and Spark silently
  * interprets the hottest per-row stage of the near-dup query. A
  * loop-shaped `doGenCode` over a referenced `int[]` compiles to a few
  * dozen bytes regardless of geometry (preference order (b) from the
  * build brief, same as [[DotProduct]]).
  *
  * Comparison semantics are the element type's native `>` — identical to
  * both the unrolled Spark CASE form and the DuckDB oracle's
  * `c[p+1] > c[q+1]`, so candidate sets stay bit-for-bit equal.
  * Elements are assumed non-null (embeddings are dense vectors).
  */
case class SignBands(child: Expression, bands: Int, bitsPerBand: Int,
    pairs: Seq[Int]) extends UnaryExpression {

  require(pairs.length == bands * bitsPerBand * 2,
    s"pairs must hold ${bands * bitsPerBand} (p,q) pairs, got ${pairs.length / 2}")
  require(bitsPerBand <= 30, "band values are Ints; bitsPerBand must be <= 30")

  private val flat: Array[Int] = pairs.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_bands expects array<float> or array<double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Int](bands)
    var k = 0
    var b = 0
    while (b < bands) {
      var v = 0
      var j = 0
      while (j < bitsPerBand) {
        val p = flat(k); val q = flat(k + 1); k += 2
        val gt =
          if (fl) xs.getFloat(p) > xs.getFloat(q)
          else xs.getDouble(p) > xs.getDouble(q)
        if (gt) v |= (1 << j)
        j += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pairsRef = ctx.addReferenceObj("signBandPairs", flat, "int[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, xs => {
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      s"""
         |int[] $out = new int[$bands];
         |int $k = 0;
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $v = 0;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    if ($xs.$getter($pairsRef[$k]) > $xs.$getter($pairsRef[$k + 1])) {
         |      $v |= (1 << $j);
         |    }
         |    $k += 2;
         |  }
         |  $out[$b] = $v;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}
