package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bloom-filter membership probe over an m-bit array packed into
  * int64 words at [[BloomProbe.WordBits]] bits per word: ONE md5 of the
  * probe string split into two 56-bit halves (h1 = digest bytes 0-6,
  * h2 = bytes 7-13), then the [[BloomProbe.K]] Kirsch–Mitzenmacher
  * double-hashed positions `(h1 + i·(2·h2+1)) mod m` are tested in a
  * tight loop with early exit on the first clear bit.
  *
  * Bit-identical to the engine's SQL spelling of the same probe —
  *   h1   = cast(conv(substring(md5(s), 1, 14), 16, 10) as bigint)
  *   step = 2 * cast(conv(substring(md5(s), 15, 14), 16, 10) as bigint) + 1
  *   ∀ i<K: bloom[(h1+i·step)%m div 62] & (1 << (h1+i·step)%m%62) ≠ 0
  * — which DuckDB replays verbatim in the q75 oracle (BloomProbeSpec pins
  * the identity on adversarial inputs; q75's corpus-wide hash gate
  * re-certifies it every round). A native expression rather than that
  * spelling inline because Catalyst's CollapseProject +
  * PushPredicateThroughProject re-expand every h1/step reference into its
  * defining expression: a 7-conjunct filter evaluates md5+conv 14-28
  * times per gram (measured ~600 ns each — +2 s on the sf0.1 probe
  * stream), where this expression pays exactly one hex-free md5.
  * Preference order (b) from the build brief: codegen'd, no boxing, no
  * UDF — replaces the engine's last `udf(...)` (the Guava
  * `mightContain` broadcast probe this operator used through r11).
  */
case class BloomProbe(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe expects (string, array<bigint>, bigint), got $other")
    }

  override def nullSafeEval(s: Any, bloom: Any, m: Any): Any =
    BloomProbe.probe(s.asInstanceOf[UTF8String],
      bloom.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b, m) =>
      s"${ev.value} = graft.expr.BloomProbe.probe($s, $b, $m);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomProbe =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Multi-filter variant of [[BloomProbe]] for q193's sizing sweep: ONE
  * md5 of the probe string, then the K double-hashed positions are
  * tested against EVERY filter of a (blooms, ms) family — budget j's
  * verdict lands in bit j of the returned int64 mask. Bit-identical to
  * `graft_bloom_probe(s, blooms[j], ms[j])` per budget (the h1/step
  * derivation is byte-for-byte [[BloomProbe.probe]]'s); exists because
  * the sweep's five per-budget probes each re-hashed the same gram —
  * five md5s per probe row where one suffices (guide §1.2 step 2:
  * per-task work, measured ~600 ns per md5 on the sf0.1 probe stream). */
case class BloomProbeMulti(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(ArrayType(LongType, _), _),
          ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe_multi expects (string, array<array<bigint>>, array<bigint>), got $other")
    }

  override def nullSafeEval(s: Any, blooms: Any, ms: Any): Any =
    BloomProbe.probeMulti(s.asInstanceOf[UTF8String],
      blooms.asInstanceOf[ArrayData], ms.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b, m) =>
      s"${ev.value} = graft.expr.BloomProbe.probeMulti($s, $b, $m);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomProbeMulti =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomProbe {

  /** Salted probes per element — ln 2 · bits-per-element rounded for the
    * build side's 10 bits/element (fpp ≈ 0.82 %). */
  val K = 7

  /** Bits packed per int64 word — 62, not 64, because the SQL mirror's
    * `1 << 63` is an overflow error in DuckDB; capping the in-word
    * offset at 61 keeps every mask positive in both engines. */
  val WordBits = 62

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** True iff all K double-hashed bit positions of `s` are set in the
    * packed word array. Called from generated code. */
  def probe(s: UTF8String, words: ArrayData, m: Long): Boolean = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // the two 56-bit halves conv(substring(md5, 1, 14)) and
    // conv(substring(md5, 15, 14)) parse from the hex form: digest
    // bytes 0-6 and 7-13, most-significant first
    var h1 = 0L
    var h2 = 0L
    var b = 0
    while (b < 7) {
      h1 = (h1 << 8) | (d(b) & 0xffL)
      h2 = (h2 << 8) | (d(b + 7) & 0xffL)
      b += 1
    }
    val step = 2L * h2 + 1L
    val n = words.numElements()
    var i = 0
    while (i < K) {
      val pos = (h1 + i * step) % m
      val wi = (pos / WordBits).toInt
      if (wi >= n) return false // defensive: build sizes the array from m
      if ((words.getLong(wi) & (1L << (pos % WordBits).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** [[BloomProbeMulti]]'s kernel: one digest, every filter of the
    * family tested with [[probe]]'s exact position arithmetic; budget
    * j's verdict is bit j of the mask. Called from generated code. */
  def probeMulti(s: UTF8String, blooms: ArrayData, ms: ArrayData): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h1 = 0L
    var h2 = 0L
    var b = 0
    while (b < 7) {
      h1 = (h1 << 8) | (d(b) & 0xffL)
      h2 = (h2 << 8) | (d(b + 7) & 0xffL)
      b += 1
    }
    val step = 2L * h2 + 1L
    val nb = ms.numElements()
    var mask = 0L
    var j = 0
    while (j < nb) {
      val m = ms.getLong(j)
      val words = blooms.getArray(j)
      val n = words.numElements()
      var ok = true
      var i = 0
      while (ok && i < K) {
        val pos = (h1 + i * step) % m
        val wi = (pos / WordBits).toInt
        if (wi >= n ||
          (words.getLong(wi) & (1L << (pos % WordBits).toInt)) == 0L)
          ok = false
        i += 1
      }
      if (ok) mask |= (1L << j)
      j += 1
    }
    mask
  }

  /** Defensive per-session registration, mirroring
    * [[Md5Hash56.register]]. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_probe",
      { exprs =>
        require(exprs.length == 3,
          "graft_bloom_probe takes exactly 3 arguments: s, bloom, m")
        BloomProbe(exprs.head, exprs(1), exprs(2))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_probe_multi",
      { exprs =>
        require(exprs.length == 3,
          "graft_bloom_probe_multi takes exactly 3 arguments: s, blooms, ms")
        BloomProbeMulti(exprs.head, exprs(1), exprs(2))
      },
      "built-in")
  }
}
