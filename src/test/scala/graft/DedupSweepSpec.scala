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
