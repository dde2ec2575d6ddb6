package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk-backed build-once cache for deterministic derived frames, keyed
  * by corpus CONTENT fingerprint (the q97 IVF-index pattern generalized
  * — [[Similarity.corpusFingerprint]] folds every input file's (name,
  * length, mtime) into the cache path, so a rewritten corpus reads a
  * fresh directory and a stale cache can never serve wrong rows; the
  * path itself proves provenance, which is why no manifest is needed
  * for these fingerprint-keyed dirs). Used for expensive deterministic
  * substrates consumed by several queries in one session: the REAL
  * -decode image thumbnails (q104/q117/q140) and the banded kNN graph
  * (q151/q157/q179). Durable across `clearCache()` because it lives on
  * disk, read back with full parquet pushdown.
  *
  * Concurrent builders race safely: each build lands in a
  * process-unique temp dir and is RENAMED into place (atomic per FS);
  * the loser deletes its own build and adopts the winner's completed
  * cache. */
object FrameCache {

  /** Serve the parquet cache at `cacheDir`, building it with `build`
    * on first use (or after the fingerprint-keyed path rotates). */
  def serve(s: SparkSession, cacheDir: String)(build: => DataFrame)
      : DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(cacheDir)
    val fs = dest.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(s"$cacheDir/_SUCCESS")
    if (!fs.exists(marker)) {
      val tmp = new org.apache.hadoop.fs.Path(
        s"${cacheDir}_build_${java.util.UUID.randomUUID()}")
      build.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, dest)) fs.delete(tmp, true)
    }
    s.read.parquet(cacheDir)
  }
}
