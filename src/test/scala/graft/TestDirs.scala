package graft

/** Session-scoped scratch dirs for spec fixtures (r10 verdict item 5:
  * a full test+Verify+Bench session used to leave ~35 `graft-agree*` /
  * `graft-bpe*` / `graft_curate*` dirs (~190 MB) in /tmp). Every spec
  * fixture dir now nests under ONE per-JVM root that a shutdown hook
  * deletes recursively, so the only dirs a session leaves behind are
  * the fingerprint-keyed `graft_*_v<N>_<fp>` FrameCache substrates —
  * which SHOULD persist (they are the cross-session build-once caches;
  * their paths prove their provenance). */
object TestDirs {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r.toFile)))
    r
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  /** A fresh scratch dir under the session root, deleted (with the
    * root) when the JVM exits. */
  def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
