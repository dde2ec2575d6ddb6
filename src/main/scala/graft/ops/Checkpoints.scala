package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage-cutting for iterative / multi-pass operators, with a
  * reliability knob.
  *
  * Two operators pin intermediates across jobs: q54's connected-components
  * rounds (each round must not re-embed the previous round's plan) and
  * q66/q84/q91's [[Sharding.assignShards]] (pass 1 and pass 2 must see
  * IDENTICAL partitions, because the range partitioner samples boundaries
  * at execution time). Locally, eager `localCheckpoint` / `MEMORY_AND_DISK`
  * persist close both windows — but local checkpoint blocks live on
  * executors, so on a real cluster an executor loss makes the next round
  * unrecomputable (checkpointed lineage is CUT by design).
  *
  * Setting `spark.graft.checkpointDir` to a cluster-visible path (HDFS/S3)
  * switches both call sites to eager RELIABLE `checkpoint`: blocks are
  * written to the shared filesystem and survive executor loss. The knob is
  * read per call, so a session can flip modes between queries; the
  * SparkContext checkpoint dir is set on first reliable use.
  */
object Checkpoints {

  /** Session conf key: when set (non-empty), iterative operators cut
    * lineage with reliable `checkpoint` into this directory instead of
    * `localCheckpoint`/persist. */
  val DirKey = "spark.graft.checkpointDir"

  private def reliableDir(ds: Dataset[_]): Option[String] =
    ds.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty)

  /** Eagerly materialize `ds` and cut its lineage: reliable `checkpoint`
    * when the knob is set, eager `localCheckpoint` otherwise. Both run the
    * plan exactly once (one Spark job), so per-round convergence metrics
    * observed on the plan ([[org.apache.spark.sql.Observation]]) are final
    * when this returns. */
  def stabilize[T](ds: Dataset[T]): Dataset[T] = reliableDir(ds) match {
    case Some(dir) => reliably(ds, dir)
    case None      => ds.localCheckpoint(eager = true)
  }

  /** Pin `ds`'s computed partitions for reuse by later passes: reliable
    * `checkpoint` when the knob is set (partition contents survive
    * executor loss), `MEMORY_AND_DISK` persist otherwise (spills rather
    * than evicts, so a LOCAL recompute-under-different-cuts window only
    * opens if an executor dies — the hazard the knob closes). Checkpoint
    * preserves partitioning, which is the property both callers need. */
  def pin[T](ds: Dataset[T]): Dataset[T] = reliableDir(ds) match {
    case Some(dir) => reliably(ds, dir)
    case None =>
      ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Reliable checkpoint without double execution: an unpersisted plan
    * would run twice (once for the eager materialization, once for the
    * checkpoint write — the classic RDD-checkpoint recompute), so the
    * frame is persisted for the duration of the write and released after.
    * Spark retains reliable checkpoint files for the session; enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints` to reap ones
    * whose datasets are garbage-collected. */
  private def reliably[T](ds: Dataset[T], dir: String): Dataset[T] = {
    ensureDir(ds, dir)
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = p.checkpoint(eager = true)
    p.unpersist()
    out
  }

  /** `SparkContext.setCheckpointDir` stores an fs-QUALIFIED path (e.g.
    * `file:/dir/<uuid>`) and mints a fresh UUID subdirectory on every
    * call, so comparing it against the raw knob value would re-set the
    * dir (and create a new UUID dir) on every round. The applied knob
    * value is tracked here instead — one setCheckpointDir per knob value
    * per JVM. */
  private val applied = new java.util.concurrent.atomic.AtomicReference[String]()

  private def ensureDir(ds: Dataset[_], dir: String): Unit = {
    val sc = ds.sparkSession.sparkContext
    if (applied.getAndSet(dir) != dir || sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(dir)
  }
}
