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
