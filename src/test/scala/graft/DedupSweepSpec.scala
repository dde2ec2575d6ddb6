package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** q141 (Jaccard-threshold retention sweep) and q142 (LSH banding
  * sweep) — structural properties the DuckDB hash gate can't see:
  * the banding configs' nesting law on a planted corpus, and the
  * monotone shape of the retention curve.
  */
class DedupSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Random corpus + planted exact/near dups; small enough that no band
    * group approaches the hot cap, so the pure nesting law applies. */
  private def plantedDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 25).map(i => s"w$i")
    val base = (0L until 30L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val exactDup = base.take(2).map { case (id, t) => (id + 1000L, t) }
    val nearDup = base.slice(2, 5).map { case (id, t) => (id + 2000L, t + " tail") }
    (base ++ exactDup ++ nearDup).toDF("doc_id", "text")
  }

  test("q142: band boundaries nest, so candidates(2r) is a subset of candidates(r); exact dups surface at every r") {
    val sh = Dedup.shingleHashes(plantedDocs)
    val rows = Dedup.bandingCandidates(sh).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
    val byCfg = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(Dedup.BandingConfigs.forall(byCfg.contains),
      s"configs missing from output: ${Dedup.BandingConfigs.filterNot(byCfg.contains)}")
    Dedup.BandingConfigs.sliding(2).foreach { case Seq(r, r2) =>
      val extra = byCfg(r2) -- byCfg(r)
      assert(extra.isEmpty,
        s"candidates(rows_per_band=$r2) not a subset of ($r): $extra")
    }
    val exactPairs = Set((0L, 1000L), (1L, 1001L))
    Dedup.BandingConfigs.foreach { r =>
      assert(exactPairs.subsetOf(byCfg(r)),
        s"exact-dup pairs missing at rows_per_band=$r: ${exactPairs -- byCfg(r)}")
    }
  }

  test("q141: retention curve is monotone non-increasing and docs never exceed pairs") {
    val out = SparkEntry.queries("q141_jaccard_threshold_sweep")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byJ = out.map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    byJ.sliding(2).foreach {
      case Array((j1, p1, d1, _), (j2, p2, d2, _)) =>
        assert(p2 <= p1 && d2 <= d1,
          s"cumulative counts rose with the threshold: $j1->($p1,$d1) vs $j2->($p2,$d2)")
      case _ => ()
    }
    byJ.foreach { case (j, pairsGe, docsGe, bp) =>
      assert(docsGe <= pairsGe, s"docs_ge > pairs_ge at j_bp=$j")
      assert(bp >= 0 && bp <= 10000, s"docs_ge_bp out of range at j_bp=$j: $bp")
    }
  }
}

/** q143 (embedding dimension stats) and q144 (integer BM25) against
  * planted inputs where the expected statistics and rankings are known
  * by hand. */
class RetrievalStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q143: dead, zero-heavy and varying dimensions are reported exactly") {
    import spark.implicits._
    val emb = Seq(
      1L -> Seq(1.0f, 0.0f, 0.5f),
      2L -> Seq(1.0f, 0.25f, -0.5f),
      3L -> Seq(1.0f, 0.5f, 0.0f)).toDF("vec_id", "embedding")
    val rows = graft.ops.Similarity.embeddingDimStats(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(7)))
      .toMap
    // dim 0: constant 1.0 → dead, mean/min/max = 1e6, no zeros
    assert(rows(0L) == ((3L, 1000000L, 1000000L, 1000000L, 0L, true)))
    // dim 1: {0, 0.25, 0.5} → mean floor(750000/3)=250000, one zero
    assert(rows(1L) == ((3L, 250000L, 0L, 500000L, 1L, false)))
    // dim 2: {0.5, -0.5, 0} → mean 0, min -500000, max 500000, one zero
    assert(rows(2L) == ((3L, 0L, -500000L, 500000L, 1L, false)))
  }

  test("q144: higher tf and shorter docs outrank; rare terms dominate common ones") {
    import spark.implicits._
    val filler = (10L until 24L).map(i => (i, "common common common common"))
    val docs = (Seq(
      1L -> "alpha alpha alpha beta",
      2L -> "alpha gamma gamma gamma pad pad pad pad pad pad pad pad",
      3L -> "beta beta common common") ++ filler).toDF("doc_id", "text")
    val out = graft.ops.TextOps.bm25TopK(docs,
      Seq(1 -> "alpha", 2 -> "alpha common"), k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val q1 = out.filter(_._1 == 1).sortBy(_._2)
    // only docs 1 and 2 contain alpha; doc 1 (tf=3, short) outranks
    // doc 2 (tf=1, long), and both score positive
    assert(q1.map(_._3).toSeq == Seq(1L, 2L), s"q1 ranking: ${q1.toSeq}")
    assert(q1.forall(_._4 > 0))
    // rare alpha (df=2 of 17) outweighs ubiquitous common: the two
    // alpha docs take ranks 1-2 ahead of every common-only doc
    val q2 = out.filter(_._1 == 2).sortBy(_._2)
    assert(q2.take(2).map(_._3).toSet == Set(1L, 2L), s"q2 ranking: ${q2.toSeq}")
  }
}
