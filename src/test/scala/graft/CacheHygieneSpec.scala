package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.Bridge

/** The r9 verdict's session-hygiene criterion, encoded as a gate: an
  * interactive session that runs EVERY query and materializes each with
  * a normal Dataset action must end with the CacheManager empty —
  * TransientCache releases each query's persisted intermediates as soon
  * as the action that consumed them completes, so 187 queries in one
  * session no longer accumulate MEMORY_AND_DISK entries competing for
  * executor storage. (The fingerprint-keyed FrameCache dirs are parquet
  * on disk, not CacheManager entries, and localCheckpoint blocks are
  * reaped by the ContextCleaner on GC — neither shows up here.)
  *
  * The materializing action is the `noop` sink write: a full
  * materialization of every row that fires QueryExecutionListener
  * without collecting to the driver — the same shape as an interactive
  * `df.write` and lighter than dumping 187 parquet dirs.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a session running every query ends with no cached frames") {
    val dir = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Exception => failures += s"$name: ${e.getMessage}" }
    }
    assert(failures.isEmpty, s"queries failed: ${failures.take(3)}")
    // the listener drains asynchronously on the listener bus; one last
    // cheap action plus a bounded wait lets the final query's release
    // land before the assertion
    spark.range(1).write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!Bridge.cacheIsEmpty(spark) && System.nanoTime() < deadline) {
      Thread.sleep(200)
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    assert(Bridge.cacheIsEmpty(spark),
      "CacheManager still holds cached frames after all queries ran")
  }
}
