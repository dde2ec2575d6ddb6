package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Automatic release of QUERY-SCOPED persisted frames.
  *
  * Most `persist()` sites in the operator library share one shape: an
  * intermediate is referenced several times by the plan the builder
  * RETURNS, so the builder itself can never unpersist it — by the time
  * the cache has paid off, the builder is long gone. The session-hygiene
  * contract used to be the caller's (Verify/Bench/ScaleSmoke
  * `clearCache()` between queries), which left any long-lived
  * interactive session accumulating MEMORY_AND_DISK entries across
  * queries (r9 verdict item 7: 187 queries in one session ended with
  * dozens of cached frames competing for executor storage).
  *
  * [[scoped]] closes the gap: it persists the frame AND queues it for
  * release; a session-registered [[QueryExecutionListener]] unpersists
  * every queued frame as soon as the next ACTION on that session
  * completes. For the canonical single-action query (builder constructs
  * a lazy plan, caller materializes it once) that action is exactly the
  * one the cache existed for: the persisted subtree is computed once,
  * hit by every other reference within the same action, and released
  * the moment the action finishes. A frame flushed early by an
  * unrelated interleaved action merely recomputes (correctness is
  * untouched — persist is only ever a performance hint), which is the
  * right trade for storage that otherwise leaks for the session's
  * lifetime.
  *
  * For frames that must SURVIVE several construction-time actions (an
  * iterative loop's reused input, a two-pass shard assignment), persist
  * normally and queue the frame with [[releaseAfterNextAction]] at the
  * END of the builder — construction actions have already happened, so
  * the queue entry only outlives the caller's materialization.
  *
  * Deliberately NOT routed through here: the fingerprint-keyed
  * disk-backed caches (IVF index, decoded image thumbs) — those are
  * parquet directories, not CacheManager entries — and
  * [[Checkpoints.stabilize]]'s localCheckpoints, whose blocks the
  * ContextCleaner reaps on GC. The drain is idempotent and swallows
  * per-frame failures: an already-released or session-stopped frame
  * must not fail an unrelated query's listener callback.
  */
object TransientCache {

  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[(Dataset[_], Long)]()

  // WEAKLY-keyed listener registry: sessions are never unregistered on
  // stop (SparkSession has no stop listener at this layer), so a strong
  // set would pin every session a long-lived JVM ever created (sbt test
  // suites, interactive shells) plus their plan trees. WeakHashMap keys
  // let a stopped, dropped session become GC-eligible; the synchronized
  // wrapper makes the add-returns-false dedup atomic.
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Persist `ds` (MEMORY_AND_DISK, the library-wide level) and release
    * it automatically after the next completed action on its session. */
  def scoped[T](ds: Dataset[T]): Dataset[T] =
    releaseAfterNextAction(ds.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** [[scoped]] in `df.transform(...)` position — the drop-in shape the
    * library's former inline `.persist(MEMORY_AND_DISK)` call sites
    * converted to. */
  val scopedDF: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame = df => scoped(df)

  /** Queue an ALREADY-persisted frame for release after the next
    * completed action on its session (for builders that run actions of
    * their own before returning — queue at the end, after the last
    * construction-time action). Returns `ds` for chaining. */
  def releaseAfterNextAction[T](ds: Dataset[T]): Dataset[T] = {
    ensureListener(ds.sparkSession)
    // SUPERSEDE stale twins rather than queueing alongside them:
    // `unpersist` releases by PLAN identity, so draining a previous
    // run's handle for the same logical plan would evict the cache
    // entry the CURRENT run just built (CacheManager holds one entry
    // per canonical plan). Re-registering an identical plan therefore
    // replaces the old queue entry — the storage now belongs to this
    // registration and releases on its (newer) timestamp. Measured:
    // without this, bench reruns of the assignClusters family lost
    // their fresh cache to the stale twin's drain (q85 +35 %).
    val it = pending.iterator()
    while (it.hasNext) {
      val (old, _) = it.next()
      // a stopped session's frames have no storage left to release and
      // unpersist would throw — drop the entry so the queue (and this
      // scan) can't retain dead sessions' plan trees
      if (old.sparkSession.sparkContext.isStopped) it.remove()
      // cheap schema precheck before the canonicalizing sameResult
      else if ((old.sparkSession eq ds.sparkSession) &&
          old.schema == ds.schema &&
          old.queryExecution.analyzed.sameResult(
            ds.queryExecution.analyzed))
        it.remove()
    }
    pending.add((ds, System.nanoTime()))
    // a session that only ever materializes via RDD actions (Bench's
    // toRdd protocol) never fires the listener; bound the queue so the
    // held Dataset references (and their canonicalized plans) cannot
    // accumulate without limit — the evicted oldest entries' storage
    // was almost certainly clearCache()'d by such a harness anyway
    while (pending.size() > 256) {
      val d = pending.poll()
      if (d != null) {
        try d._1.unpersist(blocking = false)
        catch { case _: Exception => () }
      }
    }
    ds
  }

  /** Number of frames currently queued for release (spec hook). */
  def pendingCount: Int = pending.size()

  /** Release EVERYTHING queued, immediately and synchronously — the
    * explicit-hygiene hook for harnesses that materialize via RDD
    * actions (`queryExecution.toRdd`, Bench's timing protocol), which
    * never fire the QueryExecutionListener: without it the pending
    * queue and its supersede scan grow for the whole session. Call next
    * to `catalog.clearCache()`; the storage is usually already evicted
    * there, so this mainly empties the queue and drops the held
    * Dataset/plan references. */
  def drainAll(): Unit = {
    var d = pending.poll()
    while (d != null) {
      if (!d._1.sparkSession.sparkContext.isStopped) {
        try d._1.unpersist(blocking = false)
        catch { case _: Exception => () }
      }
      d = pending.poll()
    }
  }

  private def ensureListener(s: SparkSession): Unit =
    if (registered.add(s))
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          drain(System.nanoTime() - durationNs)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit =
          drain(System.nanoTime())
      })

  /** Release every frame enqueued BEFORE `cutoffNanos`. The listener
    * bus delivers callbacks asynchronously, so by the time an action's
    * onSuccess fires the main thread may already have queued frames
    * the NEXT action needs (assignClusters queues its frames right
    * after its sizing count — a cutoff-free drain raced that queueing
    * and released them before first use, measured 1.7× on the q85/q90
    * family). The cutoff is the completed action's START time
    * (now − durationNs): an action can only have consumed frames that
    * existed when it began, so frames queued after it started always
    * survive to their own action. */
  private def drain(cutoffNanos: Long): Unit = {
    val keep = new java.util.ArrayList[(Dataset[_], Long)]()
    var d = pending.poll()
    while (d != null) {
      if (d._1.sparkSession.sparkContext.isStopped) ()  // dead session: drop
      else if (d._2 < cutoffNanos) {
        try d._1.unpersist(blocking = false)
        catch { case _: Exception => () }
      } else keep.add(d)
      d = pending.poll()
    }
    pending.addAll(keep)
  }
}
