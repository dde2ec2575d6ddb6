package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 56-bit md5 hash — bit-identical to the engine's canonical
  * SQL spelling `cast(conv(substring(md5(x), 1, 14), 16, 10) as long)`
  * (the first 7 digest bytes as a big-endian unsigned int), without the
  * hex ENCODE of all 16 bytes followed by a base-16 string PARSE of 14
  * characters that the SQL form pays per value. This hash is the inner
  * loop of every text substrate at scale — shingle hashing (q32/q33 and
  * everything riding `shingled`), MinHash/banding, winnowing, CDC gear
  * hashing, DSIR bucketing, hash splits — so the encode/parse overhead
  * multiplies by the corpus token count at 100 TB.
  *
  * The DuckDB oracles keep their existing hex-cast spelling: the values
  * are provably identical (Md5Hash56Spec pins expression == SQL spelling
  * on adversarial inputs, and every consumer's hash gate re-certifies it
  * corpus-wide), so swapping a consumer to this expression never moves
  * an oracle. Preference order (b) from the build brief: a native
  * codegen'd expression, inside whole-stage codegen, no boxing.
  */
case class Md5Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_56 expects a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash56.hash56(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Md5Hash56.hash56($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash56 =
    copy(child = newChild)
}

object Md5Hash56 {

  // one MessageDigest per task thread: getInstance allocates and does a
  // provider lookup — per-row cost the SQL md5() also avoids internally
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 7 md5 digest bytes of the string's UTF-8 encoding as a
    * big-endian unsigned 56-bit value — exactly what
    * `conv(substring(md5(x), 1, 14), 16, 10)` parses out of the hex
    * form (2 hex chars per byte, most-significant first). Always
    * non-negative (56 < 63 bits). Called from generated code. */
  def hash56(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }

  /** Register `graft_md5_56` in the session's function registry — the
    * same defensive per-builder registration the other native
    * expressions use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_56",
      { exprs =>
        require(exprs.length == 1, "graft_md5_56 takes exactly 1 argument")
        Md5Hash56(exprs.head)
      },
      "built-in")
}
