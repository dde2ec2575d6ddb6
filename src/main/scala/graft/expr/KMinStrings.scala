package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded bottom-k distinct STRING aggregate:
  * `graft_kmin_str(s, k)` returns the k binary-collation-smallest
  * DISTINCT values of `s` per group as an ascending array — the string
  * sibling of [[KMinDistinct]], built for deterministic per-block caps
  * over LOW-cardinality block keys.
  *
  * Why a custom aggregate instead of the rank-window spelling
  * (`row_number() OVER (PARTITION BY blk ORDER BY s) <= k`): a window
  * partition is ONE task, so a cap keyed on a low-cardinality
  * structural key (q225's length bucket: ~tens of distinct values over
  * the whole name domain) funnels the entire corpus through a handful
  * of single-task sorts — the exact skew shape that stalls a
  * 1000-executor cluster no matter how many cores it has. This buffer
  * is a k-capped ordered set: update is O(log k) against the CURRENT
  * k-th minimum (values at or above it never enter a full buffer),
  * merge is the same bounded insert, so partial aggregation runs
  * map-side and the shuffle carries at most k strings per
  * (partition, group) — state O(k), parallelism that of the SCAN, not
  * of the block-key cardinality. High-cardinality blocks (q224/q225's
  * token blocks) keep the window spelling: there the partition count
  * IS the parallelism and the window needs no second join to carry
  * payload columns.
  *
  * Result equivalence (KMinStringsSpec pins it): identical to the
  * rank-window cap — the k alphabetically-first distinct strings —
  * because UTF8String's comparator is unsigned byte order, the same
  * binary collation DuckDB's default `ORDER BY` uses, so the DuckDB
  * oracle replays this aggregate as `row_number() <= k` over
  * `SELECT DISTINCT`. Duplicates collapse inside the bounded buffer
  * (TreeSet), so feeding raw rows needs no pre-`distinct` pass. */
case class KMinStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmin_str expects a string, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_kmin_str k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def add(buf: java.util.TreeSet[UTF8String], v: UTF8String): Unit =
    // membership/ordering checks run on the (possibly buffer-backed)
    // value; only a WINNER is clone()d into the set — update() values
    // may alias the scan's reused row buffer, and storing an alias
    // would let later rows rewrite the set's contents in place
    if (buf.size < k) { buf.add(v.clone()); () }
    else if (v.compareTo(buf.last()) < 0) {
      if (buf.add(v.clone())) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[UTF8String],
      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[UTF8String],
      other: java.util.TreeSet[UTF8String])
      : java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val out = new Array[AnyRef](buf.size)
    val it = buf.iterator()  // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    var n = 4
    val it0 = buf.iterator()
    while (it0.hasNext) n += 4 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val s = it.next().getBytes
      bb.putInt(s.length)
      bb.put(s)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      buf.add(UTF8String.fromBytes(s))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinStrings =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinStrings =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): KMinStrings = copy(child = newChild)
  override def prettyName: String = "graft_kmin_str"
}

object KMinStrings {

  /** Build from SQL-call argument list: `graft_kmin_str(s, k)` with k a
    * foldable int literal (the cap is a plan-time constant — the
    * bounded buffer is sized by it). */
  def fromArgs(exprs: Seq[Expression]): KMinStrings = {
    require(exprs.length == 2,
      "graft_kmin_str takes exactly 2 arguments: s, k")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_kmin_str k must be an int literal, got $other")
    }
    KMinStrings(exprs.head, k)
  }

  /** Defensive per-session registration (the driver harness builds
    * plain sessions without the extensions conf). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmin_str", fromArgs, "built-in")
}
