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
    // other and silently time a warm read
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
