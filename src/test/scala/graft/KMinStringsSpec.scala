package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.KMinStrings

/** Pins the native bounded bottom-k distinct STRING aggregate
  * (`graft_kmin_str`, the q225 length-pass block cap) against the
  * declarative spelling `slice(array_sort(collect_set(s)), 1, k)` —
  * same values, same (binary) order, same dedup — on data that
  * exercises duplicates, non-ASCII, and the partial/merge path
  * (multi-partition groupBy), plus the under-k window, the buffer-
  * aliasing hazard, and the serde round-trip. */
class KMinStringsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_kmin_str equals declarative bottom-k distinct across partitions") {
    KMinStrings.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // small value domain so dedup matters; a multi-byte UTF-8 string in
    // the domain pins the BINARY collation (UTF8String byte order ==
    // array_sort's ordering == DuckDB's default varchar ORDER BY)
    val domain = (1 to 200).map(i => f"name$i%04d") ++ Seq("zz", "ä-umlaut")
    val rows = (1 to 5000).map { _ =>
      (rnd.nextInt(7), domain(rnd.nextInt(domain.size)))
    }
    val df = rows.toDF("g", "s").repartition(8)
    def collect(c: String): Map[Int, Seq[String]] =
      df.groupBy("g").agg(expr(c).as("ks")).collect()
        .map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val got = collect("graft_kmin_str(s, 16)")
    val want = collect("slice(array_sort(collect_set(s)), 1, 16)")
    assert(got == want)
    assert(got.values.forall(_.length == 16), "every group exceeds k here")
    assert(got.values.forall(s => s == s.sorted && s.distinct == s))
  }

  test("under-k groups return the full distinct set; nulls are ignored; buffer aliasing cannot corrupt the set") {
    KMinStrings.register(spark)
    import spark.implicits._
    val df = Seq((1, Some("b")), (1, None), (1, Some("b")), (1, Some("a")))
      .toDF("g", "s")
    val got = df.groupBy("g").agg(expr("graft_kmin_str(s, 128)").as("ks"))
      .head().getSeq[String](1)
    assert(got == Seq("a", "b"))
    // aliasing: a long UNSORTED single-partition stream (unsafe-row
    // backed values reused between rows) — a missing clone() would
    // surface as duplicated/corrupt entries here
    val many = (1 to 2000).map(i => (1, f"v${(i * 131) % 500}%04d"))
      .toDF("g", "s").coalesce(1)
    val ks = many.groupBy("g").agg(expr("graft_kmin_str(s, 10)").as("ks"))
      .head().getSeq[String](1)
    assert(ks == (0 until 10).map(i => f"v$i%04d"))
  }

  test("serialize/deserialize round-trips the bounded buffer") {
    import org.apache.spark.unsafe.types.UTF8String
    val agg = KMinStrings(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 3)
    val buf = agg.createAggregationBuffer()
    Seq("pear", "fig", "", "ä", "apple", "fig")
      .foreach(v => buf.add(UTF8String.fromString(v)))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    assert(agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
      .isEmpty)
  }

  test("k must be an int literal") {
    val e = intercept[IllegalArgumentException] {
      KMinStrings.fromArgs(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal("s"),
        org.apache.spark.sql.catalyst.expressions.Literal(0L)))
    }
    assert(e.getMessage.contains("int literal"))
  }
}
