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
  * Usage: runMain graft.GraphStats <sfDir> [sfDir ...] [--drop]
  */
object GraphStats {
  def main(args: Array[String]): Unit = {
    val drop = args.lastOption.contains("--drop")
    val dirs = (if (drop) args.dropRight(1) else args).toSeq
    require(dirs.nonEmpty, "usage: GraphStats <sfDir> [sfDir ...] [--drop]")
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
      val p54 = ops.Dedup.lshCandidatePairsCached(spark, dir).count()
      // the SAME symmetrization q157 runs (Similarity.mutualEdges), so
      // the printed regime call is about the pillar's actual graph
      val m = ops.Similarity.mutualEdges(
        ops.Similarity.knnGraphCached(spark, dir)
          .select(col("vec_id").as("a"), col("neighbor").as("b"))).count()
      def regime(pairs: Long) =
        if (pairs <= cap) s"endgame (${fmtX(cap, pairs)}x headroom)"
        else s"loop (${fmtX(pairs, cap)}x over cap)"
      println(s"""{"metric":"graph_stats","dir":"$dir","q54_pairs":$p54,"q157_mutual_pairs":$m,"endgame_cap_pairs":$cap,"q54_path":"${regime(p54)}","q157_path":"${regime(m)}"}""")
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
}
