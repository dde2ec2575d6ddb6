package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the connected-components pillar: prints, for each
  * sfDir argument, the PAIR counts of the two CC-feeding graphs (q54's
  * banded MinHash candidate pairs; q157's mutual-kNN pairs) next to
  * [[ops.Dedup.SmallGraphEdgeCap]], so the union-find-endgame question
  * ("does this corpus still take the single-task fast path, and how far
  * is the crossover?") is answered by measurement instead of guesswork.
  * The substrates build through their normal FrameCache paths — on a
  * fresh corpus this PAYS the build cost (size the heap accordingly:
  * `SPARK_DRIVER_MEM=24g` for a 100× smoke corpus); pass `--drop` LAST
  * to reclaim the probed corpora's cache dirs afterwards (for one-shot
  * smoke corpora — mirrors ScaleSmoke's teardown).
  *
  * With `--cc` (r13 verdict item 2), each graph is ALSO solved by BOTH
  * CC regimes — the union-find endgame (default cap) and the
  * checkpointed label-prop loop (cap forced to 0) — timing each,
  * reporting the loop's round count, and asserting the two labelings
  * bit-identical ON THAT GRAPH (`cc_label_mismatches` must print 0):
  * the past-cap path is thereby exercised and timed on a real corpus
  * (e.g. the 100× smoke corpus) instead of only at spec scale, and the
  * crossover story in BASELINE.md rests on a measured loop, not on
  * extrapolated pre-endgame numbers.
  *
  * Usage: runMain graft.GraphStats <sfDir> [sfDir ...] [--cc] [--drop]
  */
object GraphStats {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    // reject unknown flags loudly: a typo'd --ccc silently skipping the
    // dual-regime pass would let a measurement session believe it ran
    val unknown = flags -- Set("--cc", "--drop")
    require(unknown.isEmpty,
      s"unknown flag(s) ${unknown.mkString(", ")} — " +
        "usage: GraphStats <sfDir> [sfDir ...] [--cc] [--drop]")
    val drop = flags("--drop")
    val ccBoth = flags("--cc")
    val dirs = args.filterNot(_.startsWith("--")).toSeq
    require(dirs.nonEmpty,
      "usage: GraphStats <sfDir> [sfDir ...] [--cc] [--drop]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cap = ops.Dedup.SmallGraphEdgeCap
    dirs.foreach { dir =>
      val pairs54 = ops.Dedup.lshCandidatePairsCached(spark, dir)
      val p54 = pairs54.count()
      // the SAME symmetrization q157 runs (Similarity.mutualEdges), so
      // the printed regime call is about the pillar's actual graph
      // persisted: the mutual self-join otherwise re-executes for the
      // count, inside each CC regime's symmetrize, and again in the
      // label-equality except() — recompute cost that would inflate
      // the reported regime seconds with work that belongs to neither
      val mutual = ops.Similarity.mutualEdges(
        ops.Similarity.knnGraphCached(spark, dir)
          .select(col("vec_id").as("a"), col("neighbor").as("b")))
        .persist()
      val m = mutual.count()
      def regime(pairs: Long) =
        if (pairs <= cap) s"endgame (${fmtX(cap, pairs)}x headroom)"
        else s"loop (${fmtX(pairs, cap)}x over cap)"
      println(s"""{"metric":"graph_stats","dir":"$dir","q54_pairs":$p54,"q157_mutual_pairs":$m,"endgame_cap_pairs":$cap,"q54_path":"${regime(p54)}","q157_path":"${regime(m)}"}""")
      if (ccBoth) Seq(("q54", pairs54), ("q157", mutual)).foreach {
        case (tag, pairs) =>
          // both regimes on the SAME graph: default cap (endgame unless
          // genuinely over it) vs cap=0 (label-prop loop forced). The
          // loop executes eagerly (each round is a checkpoint job), so
          // the timed span covers the rounds; count() flushes the tail.
          def run(capOverride: Long): (org.apache.spark.sql.DataFrame,
              Long, Double, Int) = {
            val t0 = System.nanoTime()
            // persisted before count() materializes it (r14 ADVICE):
            // the except()-based mismatch check below would otherwise
            // re-execute BOTH labelings — the endgame side re-running
            // its full union-find path, the loop side re-reading its
            // checkpoints — roughly doubling --cc wall on the large
            // smoke corpora this flag exists for. The cache write rides
            // inside the timed span; it is a per-row copy, small next
            // to the labeling it avoids recomputing.
            val df = ops.Dedup.connectedComponents(pairs,
              smallGraphCap = capOverride).persist()
            val n = df.count()
            (df, n, (System.nanoTime() - t0) / 1e9, ops.Dedup.lastCcRounds)
          }
          val (fastDf, fastN, fastSec, fastRounds) = run(cap)
          val (loopDf, loopN, loopSec, loopRounds) = run(0L)
          // bit-identical labeling check on the real graph — the spec
          // pins this at test scale, this pins it at corpus scale
          val mism = fastDf.except(loopDf)
            .union(loopDf.except(fastDf)).count()
          fastDf.unpersist()
          loopDf.unpersist()
          println(s"""{"metric":"cc_both_regimes","dir":"$dir","graph":"$tag","labeled_nodes":$fastN,"endgame_sec":${fmtS(fastSec)},"endgame_rounds":$fastRounds,"loop_sec":${fmtS(loopSec)},"loop_rounds":$loopRounds,"loop_nodes":$loopN,"cc_label_mismatches":$mism}""")
          // the scaladoc says ASSERTING, so a divergence fails the run
          // (after the JSON line prints, so the evidence survives) —
          // a scripted --cc invocation must not exit green on mismatch
          require(mism == 0L,
            s"$tag: $mism label mismatches between CC regimes at $dir")
      }
      mutual.unpersist()
    }
    if (drop) {
      val fps = dirs.flatMap { d =>
        Seq("documents", "embeddings").flatMap { t =>
          try Some(ops.Similarity.corpusFingerprint(spark, d, t))
          catch { case _: Exception => None }
        }
      }.toSet
      val reclaimed = ops.FrameCache.drop(spark, fps)
      println(s"[graph-stats] teardown reclaimed ${reclaimed.size} cache dir(s)")
    }
    spark.stop()
  }

  private def fmtX(a: Long, b: Long): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(a.toDouble / b))

  private def fmtS(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
}
