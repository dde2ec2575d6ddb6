package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native bounded bottom-k distinct aggregate: `graft_kmin(h, k)` returns
  * the k smallest DISTINCT int64 values of `h` per group as an ascending
  * array — the KMV (k-minimum-values) sketch substrate (Bar-Yossef et al.,
  * RANDOM 2002: the (k−1)·2^bits / h_(k) distinct-count estimator).
  *
  * Why a custom aggregate instead of composing built-ins: the declarative
  * spellings either collect the whole group before truncating
  * (`slice(sort_array(collect_set(h)), 1, k)` — per-group state linear in
  * DISTINCT values, billions at 100 TB) or full-sort every group under a
  * window (`row_number() OVER (ORDER BY h) <= k` — a distributed sort of
  * the entire corpus to keep 128 values per group). This buffer is a
  * k-capped ordered set: update is O(log k) against the CURRENT k-th
  * minimum (values above it never enter), merge is the same bounded
  * insert, so partial aggregation runs map-side and the shuffle carries
  * at most k longs per (partition, group) — the aggregate state is
  * O(k), not O(distinct). Preference order (b) from the build brief:
  * a native Catalyst function where built-ins can't express the
  * semantics at scale.
  *
  * Duplicate hashes collapse in the set (KMV is defined over the
  * distinct hash multiset → set), so feeding RAW rows needs no
  * pre-`distinct` pass — dedup happens inside the bounded buffer.
  * Deterministic for any input order; DuckDB replays it as
  * `row_number() OVER (ORDER BY h) <= k` over `SELECT DISTINCT`, which
  * the q195 oracle does (KMinDistinctSpec pins the equivalence).
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmin expects a bigint, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_kmin k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    // values at or above the current k-th minimum of a FULL buffer can
    // never be among the k smallest — skip without touching the set
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()  // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): KMinDistinct = copy(child = newChild)
  override def prettyName: String = "graft_kmin"
}

object KMinDistinct {

  /** Build from SQL-call argument list: `graft_kmin(h, k)` with k a
    * foldable int literal (the sketch size is a plan-time constant —
    * the bounded buffer is sized by it). */
  def fromArgs(exprs: Seq[Expression]): KMinDistinct = {
    require(exprs.length == 2, "graft_kmin takes exactly 2 arguments: h, k")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_kmin k must be an int literal, got $other")
    }
    KMinDistinct(exprs.head, k)
  }

  /** Defensive per-session registration (the driver harness builds
    * plain sessions without the extensions conf). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmin", fromArgs, "built-in")

  /** Largest int64-safe sketch size: the estimator numerator
    * (k−1)·2⁵⁶ must stay under 2⁶³, so k ≤ 128. */
  val MaxK = 128

  private def numerator(k: Int): Long = {
    require(k >= 2 && k <= MaxK,
      s"KMV estimator needs 2 <= k <= $MaxK (got $k): (k-1)*2^56 must fit int64")
    (k - 1).toLong << 56
  }

  /** SQL for the KMV distinct estimate over a `graft_kmin(h, k)` sketch
    * column: groups under k distinct hashes report their EXACT count
    * (the sketch holds every value); saturated sketches report
    * (k−1)·2⁵⁶ div h_(k), int64 throughout, with greatest(h,1) guarding
    * the ~k·2⁻⁵⁶ zero-hash divide. The numerator is COMPUTED from k so
    * the pair can never drift apart at a call site — a drift the DuckDB
    * hash gate cannot catch, because each oracle replays its own
    * query's (equally wrong) arithmetic. Every Spark-side consumer
    * (q195/q197/the streaming vocab card; q196 via
    * [[estimateFromKthSql]]) goes through here. */
  def estimateSql(sk: String, k: Int): String =
    s"""if(size($sk) < $k, cast(size($sk) as bigint),
        ${numerator(k)}L div greatest(element_at($sk, $k), 1L))"""

  /** The estimate when the sketch was already reduced to its size and
    * k-th minimum (q196's merged-union shape): same arithmetic over a
    * pre-aggregated (count, kth-min) pair. */
  def estimateFromKthSql(n: String, hk: String, k: Int): String =
    s"CASE WHEN $n < $k THEN $n ELSE ${numerator(k)}L div greatest($hk, 1L) END"
}
