package graft.ops

import org.apache.hadoop.fs.Path
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
  * Cache paths carry a FORMAT VERSION as well as the corpus
  * fingerprint ([[path]]): the fingerprint proves the INPUT is the
  * same, the version proves the BUILDER is — the dirs outlive the
  * process and the commit that wrote them, so a semantic change to a
  * cached pipeline (shingle hash constants, banding configs, kNN
  * internals, CDC params…) must bump its version constant or old
  * sessions' frames would silently serve the pre-change results.
  *
  * Concurrent builders race safely: each build lands in a
  * process-unique temp dir and is published with a re-check of the
  * winner's `_SUCCESS` marker — a loser deletes its own build and
  * adopts the winner's completed cache. The publish also guards the
  * Hadoop `rename` trap: renaming onto an EXISTING directory does not
  * fail, it moves the source INSIDE the destination (HDFS moves
  * tmp into dest; LocalFileSystem's copy fallback lands
  * dest/<tmpname>), which would durably corrupt the cache with
  * duplicated rows — so an unexpected nested dir is detected and
  * removed, and a marker-less partial dir (a crashed earlier build) is
  * cleared before the rename. */
object FrameCache {

  /** Canonical versioned cache path, `graft_<name>_v<version>_<fp>`,
    * under the `graft.frameCacheDir` system property when set (the test
    * harness points it at a session-scoped scratch root so spec
    * fixtures' caches are deleted with the fixtures — their random
    * paths make the fingerprints unreusable anyway), else
    * `java.io.tmpdir` (the durable cross-session location). Bump a
    * substrate's version constant with ANY semantic change to its
    * builder — the fingerprint only tracks the input corpus, not the
    * build code. */
  /** The directory [[path]] roots its cache dirs under — exposed so
    * tooling that enumerates or deletes cache dirs (ScaleSmoke's
    * `dropFrameCaches`) resolves the SAME location paths are built
    * against, whatever `graft.frameCacheDir` says. */
  def baseDir: String =
    sys.props.getOrElse("graft.frameCacheDir",
      System.getProperty("java.io.tmpdir"))

  /** `base` is injectable so specs exercise path/gc/drop against a
    * scratch root WITHOUT mutating the global `graft.frameCacheDir`
    * property (r12 verdict: the mutate-and-restore pattern was safe
    * only under sequential forked suites); production callers take the
    * default. */
  def path(name: String, version: Int, fingerprint: String,
      base: String = baseDir): String =
    s"$base/graft_${name}_v${version}_$fingerprint"

  /** Serve the parquet cache at `cacheDir`, building it with `build`
    * on first use (or after the fingerprint-keyed path rotates). */
  def serve(s: SparkSession, cacheDir: String)(build: => DataFrame)
      : DataFrame = serveHooked(s, cacheDir)(build)(() => ())

  /** [[serve]] with a test seam fired between the publish check and the
    * read — FrameCacheSpec injects the concurrent-builder delete there
    * to pin the lost-race reader retry. Production calls pass a no-op. */
  private[graft] def serveHooked(s: SparkSession, cacheDir: String)(
      build: => DataFrame)(beforeRead: () => Unit): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val dest = new Path(cacheDir)
    val fs = dest.getFileSystem(conf)
    val marker = new Path(s"$cacheDir/_SUCCESS")
    def ensureBuilt(): Unit = if (!fs.exists(marker)) {
      val tmp = new Path(
        s"${cacheDir}_build_${java.util.UUID.randomUUID()}")
      build.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(marker)) {
        // a concurrent builder won while we built: adopt its cache
        fs.delete(tmp, true)
      } else {
        // a dest dir WITHOUT the marker is a crashed partial build:
        // clear it so the rename below lands at dest itself instead of
        // nesting inside it. The marker is RE-checked immediately
        // before the delete to shrink the window in which a winner
        // landing between the checks could be deleted; the residual
        // race is harmless to the CACHE (both builders produce
        // identical content, and ours renames in right after) but can
        // transiently fail a reader holding the deleted files — closed
        // for the READ path below by one bounded retry.
        if (fs.exists(dest) && !fs.exists(marker)) fs.delete(dest, true)
        if (fs.rename(tmp, dest)) {
          // rename onto a dest that (re)appeared between the checks
          // nests tmp INSIDE dest instead of failing — treat as a
          // lost race and remove the nested duplicate
          val nested = new Path(dest, tmp.getName)
          if (fs.exists(nested)) fs.delete(nested, true)
        } else fs.delete(tmp, true)
      }
    }
    ensureBuilt()
    beforeRead()
    try s.read.parquet(cacheDir)
    catch {
      // lost-race reader: a concurrent double-build judged our dir
      // marker-less between its checks and deleted it mid-read. The
      // content is deterministic (any winner's frames are identical),
      // so one bounded re-read — rebuilding first if the racer hasn't
      // republished yet — closes the multi-session window
      case e: Throwable if isMissingFiles(e) =>
        ensureBuilt()
        s.read.parquet(cacheDir)
    }
  }

  /** True when the exception chain is a missing-path/missing-file
    * failure — the signature of reading a cache dir a concurrent
    * builder deleted between our marker check and the read. */
  private def isMissingFiles(e: Throwable): Boolean = {
    val seen = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
    seen.exists {
      case _: java.io.FileNotFoundException => true
      case t => Option(t.getMessage)
        .exists(m => m.contains("PATH_NOT_FOUND") ||
          m.contains("Path does not exist"))
    }
  }

  /** Remove cache dirs under the base root that no live corpus+builder
    * owns. A `graft_<name>_v<version>_<fp>` dir (or an orphaned
    * `..._build_<uuid>` temp of one) is deleted when it is at least
    * `maxAgeDays` old AND either
    *   - its fingerprint is NOT in `keepFingerprints` (corpus orphan:
    *     the input was rewritten or was a one-shot corpus), or
    *   - a PUBLISHED (`_SUCCESS`-marked) dir for the same
    *     `(name, fingerprint)` exists at a HIGHER version (builder
    *     orphan: a version bump superseded it — without this rule,
    *     superseded dirs of a stable live corpus were protected
    *     forever, r12 ADVICE). The witness must be published so a
    *     v(N+1) build still in flight cannot retire the vN dir its
    *     readers may be mid-serve on.
    * Current-version live fingerprints are never touched whatever
    * their age; the age window grace-protects OTHER sessions' recent
    * corpora AND concurrent sessions still running pre-bump code.
    * Returns the deleted paths. Fingerprint-keyed dirs orphan on every
    * corpus rewrite or builder-version bump, so a long-lived host runs
    * this periodically via [[graft.CacheAdmin]] (ScaleSmoke's teardown
    * [[drop]]s its one-shot smoke-corpus dirs itself).
    *
    * Deleting a dir another session is actively reading is mostly-safe:
    * [[serve]]'s bounded retry covers a delete landing between the
    * marker check and the SERVE-TIME read, but a DataFrame handed out
    * earlier and executed after the delete still fails unretried — so
    * `maxAgeDays = 0` is NOT safe on hosts with concurrent live
    * sessions; keep at least a session-length retention (the default 7
    * days) there and reserve 0 for single-session hosts or teardown. */
  def gc(s: SparkSession, keepFingerprints: Set[String],
      maxAgeDays: Int = 7, base: String = baseDir): Seq[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(conf)
    if (!fs.exists(basePath)) return Seq.empty
    val cutoff = System.currentTimeMillis() - maxAgeDays * 86400000L
    val CacheDir = """graft_(.+)_v(\d+)_([0-9a-f]{32})(_build_.*)?""".r
    val all = fs.listStatus(basePath).toSeq.filter(_.isDirectory)
    // highest PUBLISHED version per (name, fp) — the supersede witnesses
    val published: Map[(String, String), Int] = all
      .flatMap(st => st.getPath.getName match {
        case CacheDir(name, v, fp, null)
            if fs.exists(new Path(st.getPath, "_SUCCESS")) =>
          Some(((name, fp), v.toInt))
        case _ => None
      })
      .groupMapReduce(_._1)(_._2)(math.max)
    all
      .filter(st => st.getPath.getName match {
        case CacheDir(name, v, fp, _) =>
          val superseded =
            published.getOrElse((name, fp), Int.MinValue) > v.toInt
          (!keepFingerprints.contains(fp) || superseded) &&
            st.getModificationTime <= cutoff
        case _ => false
      })
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }

  /** Delete every cache dir (and orphaned build temp) belonging to the
    * given fingerprints, immediately — the targeted inverse of [[gc]]
    * for corpora KNOWN to be one-shot (ScaleSmoke's expanded smoke
    * corpora clean up after themselves this way). Returns the deleted
    * paths. */
  def drop(s: SparkSession, fingerprints: Set[String],
      base: String = baseDir): Seq[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(conf)
    if (!fs.exists(basePath) || fingerprints.isEmpty) return Seq.empty
    val CacheDir = """graft_.+_v\d+_([0-9a-f]{32})(_build_.*)?""".r
    fs.listStatus(basePath).toSeq
      .filter(st => st.isDirectory && (st.getPath.getName match {
        case CacheDir(fp, _) => fingerprints.contains(fp)
        case _ => false
      }))
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }
}
