package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.KMinDistinct

/** Pins the native bounded bottom-k distinct aggregate (`graft_kmin`,
  * the q195 KMV substrate) against the declarative spelling
  * `slice(array_sort(collect_set(h)), 1, k)` — same values, same order,
  * same dedup — on data that exercises duplicates, negatives, nulls and
  * the partial/merge path (multi-partition groupBy), plus the
  * under-k exact window and the serde round-trip. */
class KMinDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_kmin equals declarative bottom-k distinct across partitions") {
    KMinDistinct.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy duplication (small value domain) so dedup matters, negatives
    // included, 8 partitions so update/serialize/merge all run
    val rows = (1 to 5000).map { _ =>
      (rnd.nextInt(7), (rnd.nextInt(400) - 200).toLong * 1234567891L)
    }
    val df = rows.toDF("g", "h").repartition(8)
    def collect(c: String): Map[Int, Seq[Long]] =
      df.groupBy("g").agg(expr(c).as("ks")).collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val got = collect("graft_kmin(h, 16)")
    val want = collect("slice(array_sort(collect_set(h)), 1, 16)")
    assert(got == want)
    assert(got.values.forall(_.length == 16), "every group exceeds k here")
    assert(got.values.forall(s => s == s.sorted && s.distinct == s))
  }

  test("a group with fewer than k distinct values returns them all") {
    KMinDistinct.register(spark)
    import spark.implicits._
    val df = Seq((1, 5L), (1, 3L), (1, 5L), (1, -9L)).toDF("g", "h")
      .repartition(3)
    val got = df.groupBy("g").agg(expr("graft_kmin(h, 128)").as("ks"))
      .head().getSeq[Long](1)
    assert(got == Seq(-9L, 3L, 5L), "exact distinct set, ascending")
  }

  test("null inputs are ignored") {
    KMinDistinct.register(spark)
    import spark.implicits._
    val df = Seq((1, Some(7L)), (1, None), (1, Some(2L)))
      .toDF("g", "h")
    val got = df.groupBy("g").agg(expr("graft_kmin(h, 4)").as("ks"))
      .head().getSeq[Long](1)
    assert(got == Seq(2L, 7L))
  }

  test("serialize/deserialize round-trips the bounded buffer") {
    val agg = KMinDistinct(
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 4)
    val buf = agg.createAggregationBuffer()
    Seq(9L, -3L, 9L, 5L, 7L, 1L, 8L).foreach(v => buf.add(v))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    assert(agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
      .isEmpty)
  }

  test("k must be an int literal") {
    val e = intercept[IllegalArgumentException] {
      KMinDistinct.fromArgs(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(0L),
        org.apache.spark.sql.catalyst.expressions.Literal(0L)))
    }
    assert(e.getMessage.contains("int literal"))
  }
}
