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

  test("q195 KMV estimates land near the exact distinct counts") {
    // the oracle hash pins CROSS-ENGINE parity; this pins the
    // ESTIMATOR against ground truth: at k = 128 the KMV relative
    // error is ~1/sqrt(k-2) ≈ 9% per draw — 30% is a ±3σ+ bound that
    // a wrong formula (off-by-one rank, wrong numerator, missed dedup)
    // blows through while honest sampling noise never does
    val dir = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("q195_kmv_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4)))
      .toMap
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(est.keySet == exact.keySet)
    for ((flag, (eo, ep)) <- est) {
      val (xo, xp) = exact(flag)
      assert(math.abs(eo - xo).toDouble / xo < 0.30,
        s"$flag orders: est $eo vs exact $xo")
      assert(math.abs(ep - xp).toDouble / xp < 0.30,
        s"$flag parts: est $ep vs exact $xp")
    }
  }

  test("q196 KMV Jaccard lands near the exact vocabulary Jaccard") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("q196_vocab_overlap_kmv")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // exact pairwise vocabulary Jaccard over the same token spelling
    val vocab = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    assert(est.nonEmpty)
    for (((sa, sb), jacMilli) <- est) {
      val (a, b) = (vocab(sa), vocab(sb))
      val exact = (a & b).size.toDouble / (a | b).size
      // σ = sqrt(J(1-J)/k) ≤ 0.045 at k = 128 — ±0.15 is > 3σ
      assert(math.abs(jacMilli / 1000.0 - exact) < 0.15,
        s"($sa,$sb): est ${jacMilli / 1000.0} vs exact $exact")
    }
  }

  test("k must be an int literal") {
    val e = intercept[IllegalArgumentException] {
      KMinDistinct.fromArgs(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(0L),
        org.apache.spark.sql.catalyst.expressions.Literal(0L)))
    }
    assert(e.getMessage.contains("int literal"))
  }

  test("estimateSql computes the numerator FROM k and rejects int64-unsafe sizes") {
    // the (k−1)·2⁵⁶ pairing is the helper's whole point: pinned here so
    // a future k change cannot silently keep a stale numerator (a drift
    // the oracle hash gate cannot see — each oracle replays its own
    // query's arithmetic)
    assert(KMinDistinct.estimateSql("sk", 128)
      .contains("9151314442816847872L"))
    assert(KMinDistinct.estimateSql("sk", 64)
      .contains(((63L << 56).toString + "L")))
    assert(KMinDistinct.estimateFromKthSql("n", "hk", 128)
      .contains("9151314442816847872L"))
    // k = 129 would need 128·2⁵⁶ = 2⁶³ — overflow; k < 2 is degenerate
    intercept[IllegalArgumentException](KMinDistinct.estimateSql("sk", 129))
    intercept[IllegalArgumentException](KMinDistinct.estimateSql("sk", 1))
    // the generated expression actually evaluates: exact under k,
    // saturated at k (sketch of size 2 with k = 2 → 1·2⁵⁶ div h₂)
    KMinDistinct.register(spark)
    import spark.implicits._
    val r = Seq((1, 100L), (1, 1L << 55), (2, 7L)).toDF("g", "h")
      .groupBy("g").agg(expr("graft_kmin(h, 2)").as("sk"))
      .select(col("g"), expr(KMinDistinct.estimateSql("sk", 2)).as("est"))
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(2) == 1L, "under-k group reports its exact count")
    assert(r(1) == (1L << 56) / (1L << 55), "saturated estimate = 2^56 div h_(2)")
  }
}
