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

  /** Long filler docs make A ≫ N, so BM25's partial (b=1/2) length
    * penalty prefers the high-tf long doc while the saturation-free
    * linear kernel prefers the short dense doc — a genuine ranking
    * disagreement for the fusion to arbitrate. */
  private def fusionDocs = {
    import spark.implicits._
    val filler = (10L until 16L).map(i => (i, Seq.fill(30)("pad").mkString(" ")))
    (Seq(
      1L -> "alpha alpha pad pad",
      2L -> (Seq.fill(8)("alpha") ++ Seq.fill(22)("pad")).mkString(" "),
      3L -> (Seq("alpha") ++ Seq.fill(29)("pad")).mkString(" ")) ++ filler)
      .toDF("doc_id", "text")
  }

  test("q145: the two kernels disagree on the planted pair, fusion scores follow the RRF formula, and both-list docs win") {
    val out = graft.ops.TextOps.rrfFuseTopK(fusionDocs, Seq(1 -> "alpha"))
      .collect()
      .map(r => (r.getLong(3), (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // planted disagreement: BM25 ranks the saturated long doc 2 first,
    // the linear kernel ranks the short dense doc 1 first
    assert(out(2L)._3 == 1L && out(2L)._4 == 2L, s"doc 2 ranks: ${out(2L)}")
    assert(out(1L)._3 == 2L && out(1L)._4 == 1L, s"doc 1 ranks: ${out(1L)}")
    assert(out(3L)._3 == 3L && out(3L)._4 == 3L, s"doc 3 ranks: ${out(3L)}")
    // every fused score equals the integer RRF formula over its ranks
    out.foreach { case (id, (_, rrf, rb, rl)) =>
      val expect = (if (rb <= graft.ops.TextOps.FuseDepth) 1000000L / (60 + rb) else 0L) +
        (if (rl <= graft.ops.TextOps.FuseDepth) 1000000L / (60 + rl) else 0L)
      assert(rrf == expect, s"doc $id rrf $rrf != $expect")
    }
    // the {1,2}/{2,1} pair ties on RRF and breaks on doc_id; the (3,3)
    // doc scores strictly lower and lands third
    assert(out(1L)._1 == 1L && out(2L)._1 == 2L && out(3L)._1 == 3L)
    assert(out(1L)._2 == out(2L)._2 && out(3L)._2 < out(2L)._2)
  }

  test("q145: a doc outside both top-depth lists earns zero and is dropped") {
    val shallow = graft.ops.TextOps.rrfFuseTopK(
      fusionDocs, Seq(1 -> "alpha"), depth = 2).collect()
    assert(shallow.map(_.getLong(3)).toSet == Set(1L, 2L),
      s"depth=2 kept: ${shallow.map(_.getLong(3)).toSeq}")
  }
}

/** q146 (power-iteration principal component) — a planted one-axis
  * corpus where the eigendirection is known, and a bitwise pure-Scala
  * mirror of the full fixed-point iteration on a random corpus (the
  * PageRankSpec pattern: the distributed rounds must equal the integer
  * mirror exactly, not approximately). */
class PrincipalComponentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.ops.Similarity.{EmbDim, PowerIterRounds, PowerShift}

  private def toDF(vecs: Seq[Array[Float]]) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** The exact integer iteration [[graft.ops.Similarity.principalComponent]]
    * distributes — truncating Long division throughout. */
  private def mirror(vecs: Seq[Array[Float]], rounds: Int): Array[Long] = {
    val mat = vecs.map(_.map(x => math.floor(x.toDouble * 1e6).toLong))
    var v = Array.fill(EmbDim)(1000000L)
    for (_ <- 1 to rounds) {
      val ts = mat.map { q =>
        q.zip(v).map { case (a, b) => a * b }.sum / (1L << PowerShift)
      }
      val u = Array.tabulate(EmbDim) { d =>
        mat.zip(ts).map { case (q, t) => t * q(d) }.sum
      }
      val m = math.max(u.map(math.abs).max / 1000000L, 1L)
      v = u.map(_ / m)
    }
    v
  }

  test("q146: a planted single-axis corpus loads entirely on that axis") {
    val vecs = Seq(0.4f, -0.3f, 0.25f, 0.5f).map { a =>
      val v = Array.fill(EmbDim)(0.0f); v(7) = a; v
    }
    val out = graft.ops.Similarity.principalComponent(toDF(vecs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == EmbDim)
    assert(math.abs(out(7L)) > 0, s"axis 7 loading: ${out(7L)}")
    (0 until EmbDim).filter(_ != 7).foreach { d =>
      assert(out(d.toLong) == 0L, s"off-axis dim $d loaded ${out(d.toLong)}")
    }
  }

  test("q146: distributed iteration equals the pure-Scala integer mirror bitwise") {
    val rnd = new scala.util.Random(29)
    val vecs = Seq.fill(40)(Array.fill(EmbDim)((rnd.nextFloat() - 0.5f) * 0.9f))
    val expect = mirror(vecs, PowerIterRounds)
    val got = graft.ops.Similarity.principalComponent(toDF(vecs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until EmbDim).foreach { d =>
      assert(got(d.toLong) == expect(d),
        s"dim $d: spark ${got(d.toLong)} != mirror ${expect(d)}")
    }
  }
}
