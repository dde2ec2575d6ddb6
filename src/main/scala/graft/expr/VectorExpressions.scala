package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path: the sequential
  * dot product of two double arrays.
  *
  * The composable form (`zip_with` + `aggregate`) allocates an
  * intermediate array and interprets a lambda per element; this expression
  * generates a tight primitive loop inside whole-stage codegen instead —
  * preference order (b) from the build brief: a custom `Expression` with
  * `doGenCode` beats a UDF, and no full operator (`SparkPlan`) is needed
  * because the semantics are scalar.
  *
  * The fold order is the same left-to-right `0.0 + x₀·y₀ + x₁·y₁ + …` as
  * both the previous Spark formulation and DuckDB's 0-prepended
  * `list_reduce`, so results stay BITWISE identical to the oracle.
  * Elements are assumed non-null (enforced upstream: the arrays come from
  * `transform(embedding, x -> cast(x as double))` over non-null vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects two array<double>, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs.getDouble(i) * ys.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xs.getDouble($i) * $ys.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `graft_dot` in the session's function registry so SQL
    * expressions (and `expr(...)` strings) can use it. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      { exprs =>
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")
}
