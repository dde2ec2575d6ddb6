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

  test("path defaults to baseDir and honors an injected base") {
    // baseDir is the SINGLE root path() and cache-enumerating tooling
    // (ScaleSmoke.dropFrameCaches) resolve by default — if they
    // diverged, a build smoke would delete under one root while serve
    // reads the other and silently time a warm read. The spec pins the
    // resolution READ-ONLY (no sys.props mutation — r12 verdict: the
    // mutate-and-restore pattern was only safe under sequential forked
    // suites); override behavior is exercised via the injected base.
    assert(FrameCache.baseDir == sys.props.getOrElse(
      "graft.frameCacheDir", System.getProperty("java.io.tmpdir")))
    assert(FrameCache.path("x", 1, "f") ==
      s"${FrameCache.baseDir}/graft_x_v1_f")
    assert(FrameCache.path("x", 1, "f", base = "/custom/root") ==
      "/custom/root/graft_x_v1_f")
    // a version bump rotates the path even for an identical corpus
    assert(FrameCache.path("x", 2, "f", base = "/custom/root") !=
      FrameCache.path("x", 1, "f", base = "/custom/root"))
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
    val deleted = FrameCache.gc(spark, Set(liveFp), maxAgeDays = 1,
      base = root)
    assert(deleted.map(new java.io.File(_).getName).toSet ==
      Set(orphanOld.getName, orphanTmp.getName))
    assert(live.exists && liveOld.exists && orphanNew.exists
      && foreign.exists)
    // 0-day retention reclaims the remaining orphan immediately;
    // live dirs still survive
    val deleted0 = FrameCache.gc(spark, Set(liveFp), maxAgeDays = 0,
      base = root)
    assert(deleted0.map(new java.io.File(_).getName) ==
      Seq(orphanNew.getName))
    assert(live.exists && liveOld.exists && foreign.exists)
  }

  test("gc retires superseded-version dirs of a LIVE corpus") {
    // r12 ADVICE: a builder-version bump orphans the previous dir, but
    // keeping by fingerprint alone protected it forever on a host with
    // a stable live corpus — gc must retire a dir when a PUBLISHED
    // higher version of the same (name, fingerprint) exists and the
    // dir has aged past the grace window (which protects concurrent
    // sessions still running pre-bump code).
    val root = TestDirs.scratch("graft_fcgcv_")
    val liveFp = "e" * 32
    val old = System.currentTimeMillis() - 2L * 86400000
    val v1Old = mkCacheDir(root, s"graft_knn4_v1_$liveFp")
    assert(v1Old.setLastModified(old))
    val v1Tmp = mkCacheDir(root, s"graft_knn4_v1_${liveFp}_build_x")
    assert(v1Tmp.setLastModified(old))
    val v2 = mkCacheDir(root, s"graft_knn4_v2_$liveFp")
    // a DIFFERENT substrate of the same corpus at v1 is NOT superseded
    // by knn4's v2 — supersede is per (name, fingerprint)
    val sweepV1 = mkCacheDir(root, s"graft_sweep_v1_$liveFp")
    assert(sweepV1.setLastModified(old))
    // an UNPUBLISHED higher version must not retire its predecessor:
    // cdc v2 exists but has no _SUCCESS yet (build in flight)
    val cdcV1 = mkCacheDir(root, s"graft_cdc_v1_$liveFp")
    assert(cdcV1.setLastModified(old))
    val cdcV2Partial = new java.io.File(root, s"graft_cdc_v2_$liveFp")
    assert(cdcV2Partial.mkdirs())  // no _SUCCESS marker
    val deleted = FrameCache.gc(spark, Set(liveFp), maxAgeDays = 1,
      base = root)
    assert(deleted.map(new java.io.File(_).getName).toSet ==
      Set(v1Old.getName, v1Tmp.getName))
    assert(v2.exists && sweepV1.exists && cdcV1.exists
      && cdcV2Partial.exists)
    // a fresh (inside-grace) superseded dir survives until it ages out
    val freshV1 = mkCacheDir(root, s"graft_mhsig_v1_$liveFp")
    mkCacheDir(root, s"graft_mhsig_v2_$liveFp")
    assert(!FrameCache.gc(spark, Set(liveFp), maxAgeDays = 1, base = root)
      .map(new java.io.File(_).getName).contains(freshV1.getName))
  }

  test("drop deletes exactly the given fingerprints' dirs, any age") {
    val root = TestDirs.scratch("graft_fcdrop_")
    val smokeFp = "c" * 32
    val otherFp = "d" * 32
    val smoke1 = mkCacheDir(root, s"graft_lshpairs_v3_$smokeFp")
    val smoke2 = mkCacheDir(root, s"graft_mhsig_v1_$smokeFp")
    val other = mkCacheDir(root, s"graft_lshpairs_v3_$otherFp")
    val deleted = FrameCache.drop(spark, Set(smokeFp), base = root)
    assert(deleted.map(new java.io.File(_).getName).toSet ==
      Set(smoke1.getName, smoke2.getName))
    assert(!smoke1.exists && !smoke2.exists && other.exists)
    assert(FrameCache.drop(spark, Set.empty, base = root).isEmpty)
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
