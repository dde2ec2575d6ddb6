package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Corpus-scale smoke for [[EventStreams.streamingSessionPaths]] (r14
  * verdict item 3): StreamingSpec pins the mirror's batch equivalence at
  * fixture scale, but the per-user state bound (≤ 8-element type prefix
  * + one long) and the throughput were derived, not measured. This main
  * drives the mirror over a REAL events corpus as rate-limited
  * micro-batches and prints one JSON line with rows/s, the peak
  * state-store row/byte counts (from `StreamingQueryProgress
  * .stateOperators` — the engine's own accounting), and a
  * batch-equivalence verdict at corpus scale.
  *
  * Micro-batching: the corpus is staged into `chunks` TIME-SLICED
  * parquet files (ntile over global (ts, event_id) order — a one-off
  * harness sort, not a pipeline pattern) with strictly increasing
  * modification times, then streamed with `maxFilesPerTrigger=1` +
  * `Trigger.AvailableNow` — so the mirror sees `chunks` ordered
  * micro-batches, exactly the arrival discipline its equality contract
  * names (per-user in-order follows from global time-slicing).
  *
  * Equivalence at corpus scale: under globally ordered arrival no
  * timeout can fire EARLY (when an in-gap successor event is processed,
  * every prior processed event has ts ≤ its own, so the watermark sits
  * ≤ last_event — short of the last+gap horizon), hence the emitted
  * rows are exactly batch [[graft.ops.Temporal.sessionPaths]] minus
  * trailing sessions whose timeout the bounded stream never reached.
  * The check asserts, as (user, path) multisets: every non-final batch
  * session emitted, and everything emitted beyond those is a final
  * session. A violation fails the run after the JSON line prints.
  *
  * Known blind spot of the multiset check (named rather than
  * overclaimed): if the mirror dropped a non-final session whose
  * (user, path) coincides with that user's FINAL session AND the
  * final's timeout emitted, the counts cancel and the check passes.
  * The emitted rows carry no per-session discriminator beyond the
  * path (adding one would change the mirror's public shape, which is
  * pinned by batch parity), so a corpus-scale check cannot separate
  * that pair; StreamingSpec's fixture-scale test pins EXACT equality
  * including trailing sessions, which covers the fold logic the
  * masking class would hide.
  *
  * With `--rocksdb` the run applies [[EventStreams.rocksDbStateStoreConf]]
  * (RocksDB provider + changelog checkpointing) — the state-store
  * configuration DESIGN'd for billion-key streaming dedup, here pinned
  * working at corpus scale on the session mirror (StreamingSpec pins
  * it at fixture scale on the dedup). Note the provider's
  * `memoryUsedBytes` counts native RocksDB memory, not per-key heap —
  * compare row counts across providers, byte counts only within one.
  *
  * Usage: runMain graft.streaming.SessionMirrorSmoke [--rocksdb] [sfDir] [chunks]
  */
object SessionMirrorSmoke {
  def main(args: Array[String]): Unit = {
    val rocksdb = args.contains("--rocksdb")
    val rest = args.filterNot(_ == "--rocksdb")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = rest.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // recentProgress retains 100 entries by default — a >100-chunk
      // run would silently undercount stream_input_rows / peak state
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (chunks + 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query-run conf, read at query start — set before start()
    if (rocksdb) EventStreams.rocksDbStateStoreConf.foreach {
      case (k, v) => spark.conf.set(k, v)
    }
    import spark.implicits._

    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

    // ---- stage: time-sliced chunk files with increasing mod times ----
    val stage = s"${System.getProperty("java.io.tmpdir")}/graft_sessmirror_stage"
    val streamDir = s"${System.getProperty("java.io.tmpdir")}/graft_sessmirror_in"
    Seq(stage, streamDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(streamDir))
    val wAll = Window.orderBy(col("ts"), col("event_id"))
    val sliced = ev.withColumn("chunk", ntile(chunks).over(wAll))
      .persist()
    val nRows = sliced.count()
    (1 to chunks).foreach { i =>
      sliced.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/c$i")
      val part = new java.io.File(s"$stage/c$i").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for chunk $i"))
      val dst = java.nio.file.Path.of(streamDir, f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      // strictly increasing mod times pin the file source's oldest-first
      // processing order to the time-slice order
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
    sliced.unpersist()

    // ---- drive the mirror: one chunk per micro-batch ----
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
      .as[EventStreams.FunnelEvent]
    val t0 = System.nanoTime()
    val q = EventStreams.streamingSessionPaths(spark, stream)
      .writeStream.format("memory").queryName("mirror_sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val inputRows = progress.map(_.numInputRows).sum
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
    val nBatches = progress.count(_.numInputRows > 0)

    // ---- corpus-scale equivalence on (user, path) multisets ----
    def multiset(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
      df.groupBy(col("user_id"), col("path"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.Temporal.sessionPaths(ev).persist()
    val lastSess = batch.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("last_sid"))
    val nonFinal = multiset(batch.join(lastSess, Seq("user_id"))
      .filter(col("session_id") < col("last_sid")))
    val all = multiset(batch)
    batch.unpersist()
    val emitted = multiset(spark.table("mirror_sessions"))
    // every non-final session emitted (gap-closure needs no watermark)…
    val missing = nonFinal.collect {
      case (k, n) if emitted.getOrElse(k, 0L) < n =>
        (k, n - emitted.getOrElse(k, 0L))
    }
    // …and nothing emitted beyond the batch truth
    val excess = emitted.collect {
      case (k, n) if n > all.getOrElse(k, 0L) => (k, n - all.getOrElse(k, 0L))
    }
    val nBatchSessions = all.values.sum
    val nEmitted = emitted.values.sum
    val nFinalOpen = nBatchSessions - nonFinal.values.sum

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val provider = if (rocksdb) "rocksdb" else "hdfs"
    println(s"""{"metric":"session_mirror_smoke","sf":"$sfDir","provider":"$provider","chunks":$chunks,"batches_with_rows":$nBatches,"rows":$nRows,"stream_input_rows":$inputRows,"wall_sec":${fmt(wall)},"rows_per_sec":${fmt(nRows / wall)},"peak_state_rows":${if (stateRows.nonEmpty) stateRows.max else -1},"peak_state_bytes":${if (stateBytes.nonEmpty) stateBytes.max else -1},"n_batch_sessions":$nBatchSessions,"n_emitted":$nEmitted,"n_final_open":$nFinalOpen,"n_missing_closed":${missing.size},"n_excess":${excess.size}}""")
    // assertions AFTER the JSON so the evidence survives a failure
    require(missing.isEmpty,
      s"${missing.size} closed sessions missing from the mirror: ${missing.take(5)}")
    require(excess.isEmpty,
      s"${excess.size} emitted sessions exceed batch truth: ${excess.take(5)}")
    spark.stop()
  }
}
