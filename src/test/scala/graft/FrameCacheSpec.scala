package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FrameCache, TransientCache}

/** Pins the FrameCache publish protocol (r11 hardening): versioned
  * cache paths, build-once semantics, and recovery from a crashed
  * partial build — the Hadoop `rename`-onto-existing-dir trap (rename
  * nests the source INSIDE an existing destination instead of failing,
  * durably duplicating rows) must never corrupt a cache dir. */
class FrameCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = new java.io.File(TestDirs.scratch("graft_fcspec_"))
    new java.io.File(d, "cache").getPath  // non-existent target inside
  }

  test("versioned path carries name, version and fingerprint") {
    val p = FrameCache.path("knn10", 3, "abc123")
    assert(p.endsWith("/graft_knn10_v3_abc123"))
    // a version bump rotates the path even for an identical corpus
    assert(FrameCache.path("knn10", 4, "abc123") != p)
  }

  test("path and baseDir both honor graft.frameCacheDir") {
    // baseDir is the SINGLE root both path() and cache-enumerating
    // tooling (ScaleSmoke.dropFrameCaches) resolve — if they diverged,
    // a build smoke would delete under one root while serve reads the
    // other and silently time a warm read.
    // NOTE: this test (and the gc/drop tests below) mutate the GLOBAL
    // graft.frameCacheDir property under try/finally — safe only while
    // suites run sequentially in one forked JVM (the build does not set
    // testForkedParallel); flipping that flag requires routing the root
    // through an injected parameter instead
    val prev = sys.props.get("graft.frameCacheDir")
    try {
      sys.props("graft.frameCacheDir") = "/custom/root"
      assert(FrameCache.baseDir == "/custom/root")
      assert(FrameCache.path("x", 1, "f") == "/custom/root/graft_x_v1_f")
      sys.props.remove("graft.frameCacheDir")
      assert(FrameCache.baseDir == System.getProperty("java.io.tmpdir"))
    } finally prev match {
      case Some(v) => sys.props("graft.frameCacheDir") = v
      case None => sys.props.remove("graft.frameCacheDir"); ()
    }
  }

  test("build runs once; the second serve reads the cache") {
    val dir = freshDir()
    var builds = 0
    def serveOnce() = FrameCache.serve(spark, dir) {
      builds += 1
      spark.range(5).toDF("id")
    }
    assert(serveOnce().count() == 5)
    assert(serveOnce().count() == 5)
    assert(builds == 1, "second serve must not rebuild")
  }

  test("a marker-less partial dir is cleared, not nested into") {
    val dir = freshDir()
    // simulate a crashed earlier build: dest exists, no _SUCCESS
    val f = new java.io.File(dir)
    assert(f.mkdirs())
    Files.writeString(new java.io.File(f, "part-junk.parquet").toPath, "x")
    val served = FrameCache.serve(spark, dir) { spark.range(3).toDF("id") }
    assert(served.count() == 3)
    // no nested _build_ directory may survive inside the cache dir
    val nested = f.listFiles().filter(_.getName.contains("_build_"))
    assert(nested.isEmpty, s"nested build dirs: ${nested.mkString(",")}")
    assert(new java.io.File(f, "_SUCCESS").exists())
    // and the junk partial file is gone
    assert(!new java.io.File(f, "part-junk.parquet").exists())
  }

  test("a reader whose dir is deleted between publish check and read retries once") {
    val dir = freshDir()
    // build and publish a complete cache first
    assert(FrameCache.serve(spark, dir) { spark.range(4).toDF("id") }
      .count() == 4)
    // lost-race reader: a concurrent double-builder judged the dir
    // marker-less and deleted it AFTER our marker check passed — the
    // seam injects that delete right before the read; the bounded
    // retry must rebuild and serve rather than surface the
    // missing-path failure to an innocent consumer
    var rebuilds = 0
    val served = FrameCache.serveHooked(spark, dir) {
      rebuilds += 1
      spark.range(4).toDF("id")
    } { () =>
      val f = new java.io.File(dir)
      def rm(x: java.io.File): Unit = {
        val kids = x.listFiles(); if (kids != null) kids.foreach(rm)
        x.delete(); ()
      }
      rm(f)
      assert(!f.exists())
    }
    assert(served.count() == 4)
    assert(rebuilds == 1, "the retry path must rebuild the deleted cache")
    assert(new java.io.File(new java.io.File(dir), "_SUCCESS").exists())
  }

  private def mkCacheDir(root: String, name: String): java.io.File = {
    val d = new java.io.File(root, name)
    assert(d.mkdirs())
    Files.writeString(new java.io.File(d, "_SUCCESS").toPath, "")
    d
  }

  test("gc removes aged orphans, never live fingerprints or foreign dirs") {
    val root = TestDirs.scratch("graft_fcgc_")
    val liveFp = "a" * 32
    val orphanFp = "b" * 32
    val prev = sys.props.get("graft.frameCacheDir")
    try {
      sys.props("graft.frameCacheDir") = root
      val live = mkCacheDir(root, s"graft_knn4_v2_$liveFp")
      val liveOld = mkCacheDir(root, s"graft_sweep_v1_$liveFp")
      assert(liveOld.setLastModified(
        System.currentTimeMillis() - 30L * 86400000))
      val orphanOld = mkCacheDir(root, s"graft_knn4_v1_$orphanFp")
      assert(orphanOld.setLastModified(
        System.currentTimeMillis() - 2L * 86400000))
      val orphanNew = mkCacheDir(root, s"graft_knn4_v2_$orphanFp")
      val orphanTmp = mkCacheDir(root,
        s"graft_knn4_v2_${orphanFp}_build_dead-beef")
      assert(orphanTmp.setLastModified(
        System.currentTimeMillis() - 2L * 86400000))
      val foreign = mkCacheDir(root, "not_a_cache_dir")
      // 1-day retention: the old orphan (and its build temp) go, the
      // recent orphan is grace-protected, live dirs survive ANY age
      val deleted = FrameCache.gc(spark, Set(liveFp), maxAgeDays = 1)
      assert(deleted.map(new java.io.File(_).getName).toSet ==
        Set(orphanOld.getName, orphanTmp.getName))
      assert(live.exists && liveOld.exists && orphanNew.exists
        && foreign.exists)
      // 0-day retention reclaims the remaining orphan immediately;
      // live dirs still survive
      val deleted0 = FrameCache.gc(spark, Set(liveFp), maxAgeDays = 0)
      assert(deleted0.map(new java.io.File(_).getName) ==
        Seq(orphanNew.getName))
      assert(live.exists && liveOld.exists && foreign.exists)
    } finally prev match {
      case Some(v) => sys.props("graft.frameCacheDir") = v
      case None => sys.props.remove("graft.frameCacheDir"); ()
    }
  }

  test("drop deletes exactly the given fingerprints' dirs, any age") {
    val root = TestDirs.scratch("graft_fcdrop_")
    val smokeFp = "c" * 32
    val otherFp = "d" * 32
    val prev = sys.props.get("graft.frameCacheDir")
    try {
      sys.props("graft.frameCacheDir") = root
      val smoke1 = mkCacheDir(root, s"graft_lshpairs_v3_$smokeFp")
      val smoke2 = mkCacheDir(root, s"graft_mhsig_v1_$smokeFp")
      val other = mkCacheDir(root, s"graft_lshpairs_v3_$otherFp")
      val deleted = FrameCache.drop(spark, Set(smokeFp))
      assert(deleted.map(new java.io.File(_).getName).toSet ==
        Set(smoke1.getName, smoke2.getName))
      assert(!smoke1.exists && !smoke2.exists && other.exists)
      assert(FrameCache.drop(spark, Set.empty).isEmpty)
    } finally prev match {
      case Some(v) => sys.props("graft.frameCacheDir") = v
      case None => sys.props.remove("graft.frameCacheDir"); ()
    }
  }

  test("drainAll empties the pending release queue immediately") {
    val ds = spark.range(10).toDF("id")
    TransientCache.scoped(ds)
    assert(TransientCache.pendingCount >= 1)
    TransientCache.drainAll()
    assert(TransientCache.pendingCount == 0)
    // unpersist removes the CacheManager entry synchronously (block
    // cleanup is async, but the storageLevel reflects the removal)
    assert(ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
