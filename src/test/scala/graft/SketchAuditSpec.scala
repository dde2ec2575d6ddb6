package graft

import org.scalatest.funsuite.AnyFunSuite

/** q188/q189 semantics pinned against planted fixtures (engine parity
  * for both queries is the DuckDB hash gate; these specs pin the
  * SEMANTICS — what the estimators and the recall must say about
  * constructed duplicates). */
class SketchAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q189: identical docs agree on every position in both sketch widths; 1-bit never agrees less than full") {
    import spark.implicits._
    val rnd = new scala.util.Random(189)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")
    val tA = words(40); val tB = words(40)
    val docs = (Seq((0L, tA), (1L, tA), (2L, tB), (3L, tB + " extra tail words here")) ++
        (4L until 12L).map(i => (i, words(40))))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("graft-bbit")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q189_bbit_minhash_audit")(spark, dir)
      .collect()
    val byPair = rows.map(r => ((r.getLong(0), r.getLong(1)), r)).toMap
    val ident = byPair((0L, 1L))
    assert(ident.getLong(2) == 8L, "identical docs: full agreement 8/8")
    assert(ident.getLong(3) == 8L, "identical docs: 1-bit agreement 8/8")
    assert(ident.getDouble(4) == 1.0 && ident.getDouble(5) == 1.0)
    assert(ident.getDouble(6) == 0.0)
    rows.foreach { r =>
      // a full-width match forces a low-bit match, never the reverse
      assert(r.getLong(3) >= r.getLong(2),
        s"pair (${r.getLong(0)},${r.getLong(1)}): 1-bit < full")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q190: water-fill keeps small sources whole, levels the rest, and sums exactly to the budget") {
    import spark.implicits._
    // sources with 10 / 20 / 100 words → total 130, budget 65:
    // a and b fit under the level (10 + 10·2 = 30 ≤ 65; 30 + 20·1 = 50
    // ≤ 65), c is capped at the remaining 35
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(("a", words(10)), ("b", words(20)), ("c", words(100)))
      .zipWithIndex
      .map { case ((src, t), i) => (i.toLong, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("graft-wfill")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q190_token_budget_waterfill")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("a") == ((10L, 10L, 0L)), s"a: ${rows("a")}")
    assert(rows("b") == ((20L, 20L, 0L)), s"b: ${rows("b")}")
    assert(rows("c") == ((100L, 35L, 1L)), s"c: ${rows("c")}")
    assert(rows.values.map(_._2).sum == 65L, "allocations must sum to the budget")
  }

  test("q191: a planted verbatim quote masks exactly its span; distant quotes stay separate islands") {
    import spark.implicits._
    val evalText = (1 to 8).map(i => s"e$i").mkString(" ")  // 5 4-grams
    // quote at words 4-11 (1-based), second quote at words 30-37
    val pad = (1 to 3).map(i => s"x$i").mkString(" ")
    val mid = (1 to 18).map(i => s"y$i").mkString(" ")
    val tail = (1 to 5).map(i => s"z$i").mkString(" ")
    val trainText = s"$pad $evalText $mid $evalText $tail"
    val docs = Seq(
      (0L, evalText, "en", "src0", evalText.length.toLong),
      (1L, trainText, "en", "src1", trainText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestDirs.scratch("graft-mask")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = SparkEntry.queries("q191_decontam_span_mask")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.toSeq == Seq((4L, 11L, 8L, 5L), (30L, 37L, 8L, 5L)),
      s"spans: ${spans.toSeq}")
  }

  test("q188: exact-copy neighbors survive int8 quantization as top-1 with qcos 1.0") {
    import spark.implicits._
    val rnd = new scala.util.Random(188)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 200L).map(i => (i, vec()))
    val copies = base.take(10).map { case (id, v) => (id + 100L, v.clone()) }
    // ids 100-109 collide with base ids — shift the copies clear
    val emb = (base ++ copies.map { case (id, v) => (id + 900L, v) })
      .toDF("vec_id", "embedding")
    val dir = TestDirs.scratch("graft-sq")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("q188_sq_ann_recall")(spark, dir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(3) == q + 1000L,
        s"query $q: quantized top-1 ${r.getLong(3)} is not its exact copy")
      assert(r.getDouble(4) == 1.0, s"query $q: top1_qcos ${r.getDouble(4)}")
      assert(r.getLong(1) >= 1L, s"query $q: exact copy missing from hits")
      assert(r.getLong(2) == r.getLong(1) * 10000L / 3L)
    }
  }
}
