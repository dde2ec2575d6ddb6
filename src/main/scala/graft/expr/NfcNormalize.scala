package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression applying Unicode NFC (canonical
  * composition) to a string column — the text-prep step every real-world
  * corpus needs before any hash/shingle/dedup operator sees the text
  * (`e` + U+0301 and the precomposed `é` must hash identically or the
  * same sentence dedups as two different documents).
  *
  * Spark ships no normalization function, and a Scala UDF would box
  * every row; this expression stays inside whole-stage codegen
  * (preference order (b) from the build brief). The JDK's
  * `java.text.Normalizer` implements the same Unicode normalization
  * algorithm (UAX #15) as DuckDB's `nfc_normalize`, and the two agree on
  * every fixture class the engine plants (combining marks, precomposed
  * accents, Hangul); the q115 gate hash-verifies that agreement over the
  * corpus rather than assuming it — the DESIGN.md "certify, don't trust"
  * rule for cross-engine builtins.
  *
  * The fast path matters at scale: `Normalizer.isNormalized` is a cheap
  * scan (most real text is already NFC) that skips the allocation-heavy
  * `normalize` call, so the expression costs ~a memcmp per already-clean
  * row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExpressions {
  /** Register `graft_nfc` in the session's function registry — the same
    * defensive per-query registration [[VectorExpressions.register]] uses
    * (the driver harness builds plain sessions without the extensions
    * conf). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      { exprs =>
        require(exprs.length == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(exprs.head)
      },
      "built-in")
}
