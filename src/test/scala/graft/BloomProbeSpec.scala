package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.BloomProbe

/** Pins `graft_bloom_probe(s, bloom, m)` ≡ the SQL spelling the q75
  * DuckDB oracle replays —
  *   h1   = cast(conv(substring(md5(s), 1, 14), 16, 10) as bigint)
  *   step = 2 * cast(conv(substring(md5(s), 15, 14), 16, 10) as bigint) + 1
  *   ∀ i<K: bloom[(h1+i·step)%m div 62] & (1 << (h1+i·step)%m%62) ≠ 0
  * — the identity q75's corpus-wide hash gate rests on. The bit arrays
  * under test are adversarial, not realistic: all-ones (every probe
  * passes → exercises every position computation), all-zeros, and
  * sparse random words, at several m values including the 64-bit floor
  * and a non-multiple of 62. */
class BloomProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sqlSpelling(m: Long): String = {
    val conj = (0 until BloomProbe.K).map { i =>
      val pos = s"((cast(conv(substring(md5(s), 1, 14), 16, 10) as bigint)" +
        s" + $i * (2 * cast(conv(substring(md5(s), 15, 14), 16, 10) as bigint) + 1))" +
        s" % ${m}L)"
      s"""(element_at(bloom, cast($pos div ${BloomProbe.WordBits} as int) + 1)
          & shiftleft(cast(1 as bigint),
              cast($pos % ${BloomProbe.WordBits} as int))) != 0"""
    }
    conj.mkString("(", ") AND (", ")")
  }

  private val strings = Seq("", "a", "the quick brown fox", "x" * 5000,
    "é", "日本語テキスト", "emoji 🙂 tail", "nul\u0000byte", "line\nbreak",
    "0", "deadbeef") ++ (0 until 2000).map(i => s"w${i % 97} gram $i")

  private def parity(m: Long, words: Array[Long]): Unit = {
    import spark.implicits._
    BloomProbe.register(spark)
    val df = strings.toDF("s")
      .withColumn("bloom", lit(words))
      .withColumn("m", lit(m))
      .select(col("s"), expr(sqlSpelling(m)).as("sql"),
        expr("graft_bloom_probe(s, bloom, m)").as("native"))
    val bad = df.filter(col("sql") =!= col("native")).collect()
    assert(bad.isEmpty, s"m=$m mismatches: ${bad.take(5).mkString(";")}")
    // all-ones arrays must accept everything (guards against an
    // off-by-one that maps some position outside the array and
    // "defensively" rejects)
    if (words.forall(_ == -1L)) {
      val rejected = strings.toDF("s")
        .withColumn("bloom", lit(words)).withColumn("m", lit(m))
        .filter(!expr("graft_bloom_probe(s, bloom, m)")).count()
      assert(rejected == 0L, s"m=$m: all-ones bloom rejected $rejected")
    }
  }

  private def nWords(m: Long): Int =
    ((m + BloomProbe.WordBits - 1) / BloomProbe.WordBits).toInt

  test("native == SQL spelling on all-ones arrays (every position exercised)") {
    Seq(64L, 620L, 1000L, 65536L).foreach { m =>
      parity(m, Array.fill(nWords(m))(-1L))
    }
  }

  test("native == SQL spelling on all-zero and sparse random arrays") {
    val rnd = new scala.util.Random(42)
    Seq(64L, 997L, 12800L).foreach { m =>
      parity(m, new Array[Long](nWords(m)))
      parity(m, Array.fill(nWords(m))(
        if (rnd.nextInt(4) == 0) rnd.nextLong() else 0L))
    }
  }

  test("multi-probe bit j == single probe against filter j, on adversarial families") {
    import spark.implicits._
    BloomProbe.register(spark)
    val rnd = new scala.util.Random(7)
    val ms = Seq(64L, 620L, 997L, 12800L, 65536L)
    // mix of all-ones (bit j always set), all-zero (never set) and
    // sparse random filters so every verdict combination is exercised
    val families: Seq[Seq[Long]] = ms.zipWithIndex.map { case (m, i) =>
      (i % 3 match {
        case 0 => Array.fill(nWords(m))(-1L)
        case 1 => new Array[Long](nWords(m))
        case _ => Array.fill(nWords(m))(
          if (rnd.nextInt(3) == 0) rnd.nextLong() else 0L)
      }).toSeq
    }
    val df = strings.toDF("s")
      .withColumn("blooms", typedLit(families))
      .withColumn("ms", typedLit(ms))
    val perBudget = ms.indices.map { j =>
      (expr(s"shiftright(graft_bloom_probe_multi(s, blooms, ms), $j) & 1L")
        === 1L) ===
        expr(s"graft_bloom_probe(s, element_at(blooms, ${j + 1}), " +
          s"element_at(ms, ${j + 1}))")
    }
    val bad = df.filter(!perBudget.reduce(_ && _)).count()
    assert(bad == 0L, s"$bad strings disagreed between multi and single probe")
    // bits above the family size must stay clear
    val high = df.filter(
      expr(s"shiftright(graft_bloom_probe_multi(s, blooms, ms), ${ms.size})")
        =!= 0L).count()
    assert(high == 0L, "mask bits past the last budget must be zero")
  }

  test("interpreted eval equals codegen (the non-codegen path)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val words = Array.fill(nWords(620L))(-1L)
    val arr = Literal.create(ArrayData.toArrayData(words),
      ArrayType(LongType, containsNull = false))
    val viaEval = BloomProbe(Literal("abc"), arr, Literal(620L)).eval(null)
    assert(viaEval == true)
    val zero = Literal.create(
      ArrayData.toArrayData(new Array[Long](nWords(620L))),
      ArrayType(LongType, containsNull = false))
    assert(BloomProbe(Literal("abc"), zero, Literal(620L)).eval(null) == false)
  }

  test("multi: interpreted eval equals per-filter single probes (non-codegen path)") {
    import graft.expr.BloomProbeMulti
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val rnd = new scala.util.Random(11)
    val ms = Seq(64L, 620L, 997L, 12800L)
    val families = ms.zipWithIndex.map { case (m, i) =>
      i % 3 match {
        case 0 => Array.fill(nWords(m))(-1L)
        case 1 => new Array[Long](nWords(m))
        case _ => Array.fill(nWords(m))(
          if (rnd.nextInt(3) == 0) rnd.nextLong() else 0L)
      }
    }
    val bloomsLit = Literal.create(
      ArrayData.toArrayData(families.map(ArrayData.toArrayData(_)).toArray),
      ArrayType(ArrayType(LongType, containsNull = false),
        containsNull = false))
    val msLit = Literal.create(ArrayData.toArrayData(ms.toArray),
      ArrayType(LongType, containsNull = false))
    Seq("", "abc", "the quick brown fox", "日本語テキスト").foreach { s =>
      val mask = BloomProbeMulti(Literal(s), bloomsLit, msLit)
        .eval(null).asInstanceOf[Long]
      ms.indices.foreach { j =>
        val single = BloomProbe(Literal(s),
          Literal.create(ArrayData.toArrayData(families(j)),
            ArrayType(LongType, containsNull = false)),
          Literal(ms(j))).eval(null).asInstanceOf[Boolean]
        assert((((mask >> j) & 1L) == 1L) == single,
          s"s=$s budget $j: mask bit ${(mask >> j) & 1L} vs single $single")
      }
      assert((mask >> ms.size) == 0L,
        s"s=$s: interpreted mask carries bits past the last budget")
    }
  }
}
