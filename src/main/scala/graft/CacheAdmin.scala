package graft

import org.apache.spark.sql.SparkSession

/** FrameCache retention tool: enumerates `graft_<name>_v<N>_<fp>` dirs
  * under [[ops.FrameCache.baseDir]] and deletes the ones no live
  * corpus+builder owns — every corpus rewrite and builder-version bump
  * orphans the previous dirs forever otherwise (at 100 TB those are
  * not kilobytes). "Live" = the fingerprints of the documents +
  * embeddings tables of each sfDir argument; a dir older than the
  * retention window goes when its fingerprint is not live OR a
  * published higher version of the same substrate supersedes it
  * (r13 — version-bump orphans of a stable live corpus are reclaimed
  * too). Current-version live dirs are never deleted, whatever their
  * age.
  *
  * Usage: runMain graft.CacheAdmin <maxAgeDays> <sfDir> [sfDir ...]
  *   maxAgeDays = 0 reclaims every non-live dir immediately — only
  *   safe when NO other session is live (gc's delete is retried by a
  *   reader only at serve time, not on frames already handed out); on
  *   shared hosts keep at least a session-length retention.
  */
object CacheAdmin {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CacheAdmin <maxAgeDays> <sfDir> [sfDir ...]")
    val maxAgeDays = args(0).toInt
    val dirs = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val live = dirs.flatMap { d =>
      Seq("documents", "embeddings").flatMap { t =>
        try Some(ops.Similarity.corpusFingerprint(spark, d, t))
        catch { case _: java.io.FileNotFoundException => None }
      }
    }.toSet
    println(s"[cache-admin] live fingerprints: ${live.toSeq.sorted.mkString(", ")}")
    val deleted = ops.FrameCache.gc(spark, live, maxAgeDays)
    deleted.foreach(p => println(s"[cache-admin] deleted $p"))
    println(s"[cache-admin] ${deleted.size} dir(s) reclaimed under " +
      s"${ops.FrameCache.baseDir} (retention ${maxAgeDays}d)")
    spark.stop()
  }
}
