package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.UserEvent

/** Streaming specs: drive each operator with a MemoryStream, process all
  * available batches synchronously, and compare against the equivalent
  * batch computation over the same rows. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming minhash candidates equal the batch candidate set below the cap (full recall)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = (0 until 30).map(i => s"w$i").mkString(" ")
    val textX = (0 until 30).map(i => s"x$i").mkString(" ")
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams
      .streamingMinhashCandidates(spark, input.toDF())
      .writeStream.format("memory").queryName("mh_cands")
      .outputMode("append").start()
    try {
      // batch 1: doc 3 and doc 7 identical → all 4 bands collide; doc 5
      // is unrelated → no pair
      input.addData(EventStreams.Doc(3L, textA), EventStreams.Doc(7L, textA),
        EventStreams.Doc(5L, textX))
      q.processAllAvailable()
      val b1 = spark.table("mh_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b1 == Set((3L, 7L)))
      // batch 2: docs 9 and 11 repeat the content → each pairs with ALL
      // earlier members (3, 7) and with each other — the round-6
      // single-anchor state would have missed (7,9), (7,11) and (9,11)
      input.addData(EventStreams.Doc(9L, textA), EventStreams.Doc(11L, textA))
      q.processAllAvailable()
      val b2 = spark.table("mh_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b2 == Set((3L, 7L), (3L, 9L), (3L, 11L), (7L, 9L), (7L, 11L),
        (9L, 11L)))
      // below the cap the streamed set EQUALS the batch operator's
      // candidate set over the same rows — full batch recall
      val batchPairs = graft.ops.Dedup.lshCandidatePairs(
        Seq((3L, textA), (7L, textA), (5L, textX), (9L, textA),
          (11L, textA)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b2 == batchPairs)
    } finally q.stop()
  }

  test("streaming minhash: a band overflowing the cap in its FIRST batch emits nothing (batch-path parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = (0 until 30).map(i => s"h$i").mkString(" ")
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams
      .streamingMinhashCandidates(spark, input.toDF(), cap = 10)
      .writeStream.format("memory").queryName("mh_hot")
      .outputMode("append").start()
    try {
      // 12 identical docs in one batch: post-batch count 12 > cap 10 →
      // hot immediately, zero pairs — the batch path drops this band
      // wholesale and the subset invariant must hold on this input too
      input.addData((1L to 12L).map(i => EventStreams.Doc(i, textA)): _*)
      q.processAllAvailable()
      assert(spark.table("mh_hot").count() == 0L)
      // and it stays silent in later batches
      input.addData(EventStreams.Doc(99L, textA))
      q.processAllAvailable()
      assert(spark.table("mh_hot").count() == 0L)
    } finally q.stop()
  }

  test("streaming minhash: a band crossing the cap in a LATER batch stops emitting; earlier pairs are retained (non-retraction)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textB = (0 until 30).map(i => s"g$i").mkString(" ")
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams
      .streamingMinhashCandidates(spark, input.toDF(), cap = 10)
      .writeStream.format("memory").queryName("mh_late_hot")
      .outputMode("append").start()
    try {
      // batch 1: 4 identical docs, under the cap → all C(4,2)=6 distinct
      // pairs (each emitted once per colliding band, like the batch
      // path's pre-distinct multiplicity)
      input.addData((1L to 4L).map(i => EventStreams.Doc(i, textB)): _*)
      q.processAllAvailable()
      assert(spark.table("mh_late_hot").distinct().count() == 6L)
      // batch 2: 8 more → post-batch count 12 > 10 → nothing new emits,
      // but the 6 already-emitted pairs stand (append mode cannot
      // retract) — the documented deviation from a batch re-run, which
      // would drop this band wholesale
      input.addData((5L to 12L).map(i => EventStreams.Doc(i, textB)): _*)
      q.processAllAvailable()
      assert(spark.table("mh_late_hot").distinct().count() == 6L)
      // and the band stays silent from then on
      input.addData(EventStreams.Doc(50L, textB))
      q.processAllAvailable()
      assert(spark.table("mh_late_hot").distinct().count() == 6L)
    } finally q.stop()
  }

  test("per-row minhash bands equal the explode+groupBy batch bands") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = graft.ops.Dedup.rowMinhashBands(docs)
      .orderBy("doc_id", "band_idx").collect().toSeq
    val b = graft.ops.Dedup.minhashBands(docs)
      .orderBy("doc_id", "band_idx").collect().toSeq
    assert(a == b)
  }

  test("hourly tumbling window aggregates arrive via append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val q = EventStreams.hourlyTumbling(events)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      // two full hours of data, then a late batch far beyond the watermark
      input.addData((0 until 120).map(m => (ts(m), 1.0)): _*)
      q.processAllAvailable()
      input.addData((ts(60 * 27), 1.0)) // advances watermark past hours 0-1
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .orderBy("hour_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Long]("n_events") == 60L)
      assert(rows(0).getAs[Double]("value_sum") == 60.0)
      assert(rows(1).getAs[Long]("n_events") == 60L)
    } finally q.stop()
  }

  test("session windows close after the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionWindows(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two bursts 90 minutes apart → two sessions
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(100), 3.0))
      q.processAllAvailable()
      input.addData((1L, ts(60 * 10), 0.0)) // watermark push
      q.processAllAvailable()
      val rows = spark.table("sessions").orderBy("session_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Double]("value_sum") == 3.0)
      assert(rows(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("streaming exact dedup keeps the first arrival across micro-batches (q31's keeper rule, unbounded)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.streamingDedup(spark, input.toDS())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts, one same-batch duplicate
      input.addData(EventStreams.Doc(5L, "alpha"), EventStreams.Doc(2L, "alpha"),
        EventStreams.Doc(3L, "beta"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicates must be dropped; one new text
      input.addData(EventStreams.Doc(9L, "alpha"), EventStreams.Doc(8L, "beta"),
        EventStreams.Doc(7L, "gamma"))
      q.processAllAvailable()
      val rows = spark.table("dedup").orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
      // min doc_id among same-batch dups (2, not 5); later batches add nothing
      assert(rows == Seq((2L, "alpha"), (3L, "beta"), (7L, "gamma")))
    } finally q.stop()
  }

  test("watermark-bounded dedup drops in-horizon duplicates; state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams
      .streamingDedupBounded(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").start()
    try {
      // distinct texts per batch (same-batch dup survival order would be
      // partitioning-dependent under dropDuplicates semantics)
      input.addData((5L, ts(10), "alpha"), (3L, ts(11), "beta"))
      q.processAllAvailable()
      // in-horizon duplicate (1 min later) dropped; new text emitted
      input.addData((9L, ts(12), "alpha"), (7L, ts(13), "gamma"))
      q.processAllAvailable()
      val rows = spark.table("dedup_bounded").orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
      assert(rows == Seq((3L, "beta"), (5L, "alpha"), (7L, "gamma")))
    } finally q.stop()
  }

  test("streaming dedup runs under the RocksDB state store (the corpus-scale provider config)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rocksDbStateStoreConf is the documented production sizing for the
    // dedup state (billions of md5 keys can't live on-heap); this pins
    // that the provider class + changelog flag actually boot and that
    // keep-first semantics are provider-independent.
    val saved = EventStreams.rocksDbStateStoreConf.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    EventStreams.rocksDbStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.streamingDedup(spark, input.toDS())
      .writeStream.format("memory").queryName("dedup_rocks")
      .outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(5L, "alpha"), EventStreams.Doc(2L, "alpha"))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(9L, "alpha"), EventStreams.Doc(7L, "gamma"))
      q.processAllAvailable()
      val rows = spark.table("dedup_rocks").orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
      assert(rows == Seq((2L, "alpha"), (7L, "gamma")))
    } finally {
      q.stop()
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("stream-stream interval join matches purchases to the preceding hour's views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.viewPurchaseJoin(
        views.toDF().toDF("user_id", "ts"),
        purchases.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("conversions")
      .outputMode("append").start()
    try {
      // user 1: view at :00, purchases at :30 (inside 1h) and at 2:30
      // (outside); user 2: purchase with no prior view
      views.addData((1L, ts(0)))
      purchases.addData((1L, ts(30), 9.99), (1L, ts(150), 5.0), (2L, ts(30), 1.0))
      q.processAllAvailable()
      // advance both watermarks far past the interval so results finalize
      views.addData((99L, ts(60 * 30)))
      purchases.addData((99L, ts(60 * 30), 0.0))
      q.processAllAvailable()
      val rows = spark.table("conversions")
        .orderBy("user_id", "purchase_ts").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("purchase_ts"),
          r.getAs[Double]("value"))).toSeq
      // exactly the in-window pair survives
      assert(rows == Seq((1L, ts(30), 9.99)))
    } finally q.stop()
  }

  test("streaming count-min sketch equals the batch sketch cell-for-cell (bounded Complete-mode state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.streamingCountMin(input.toDF())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(EventStreams.Doc(1, "alpha beta alpha"),
        EventStreams.Doc(2, "gamma beta"))
      val b2 = Seq(EventStreams.Doc(3, "alpha delta delta epsilon"))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt"))
        .toMap
      val batch = EventStreams.streamingCountMin((b1 ++ b2).toDF()).collect()
        .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt"))
        .toMap
      assert(streamed == batch)
      // every token lands in exactly one bucket per sketch row
      assert(streamed.values.sum == 4L * 9)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(spark, input.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      input.addData(UserEvent(1, "click", 1.5), UserEvent(2, "view", 2.0))
      q.processAllAvailable()
      input.addData(UserEvent(1, "purchase", 3.5))
      q.processAllAvailable()
      // update mode: latest row per user wins
      val latest = spark.table("running")
        .groupBy("user_id").agg(max("n_events").as("n"), max("value_sum").as("v"))
        .orderBy("user_id").collect()
      assert(latest(0).getAs[Long]("n") == 2L)   // user 1: two events
      assert(latest(0).getAs[Double]("v") == 5.0)
      assert(latest(1).getAs[Long]("n") == 1L)
    } finally q.stop()
  }

  test("streaming data card equals the batch card cell-for-cell (q108's mergeability, maintained online)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = EventStreams.streamingDataCard(input.toDF())
      .writeStream.format("memory").queryName("card_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(EventStreams.SourceDoc(1, "sA", "alpha beta gamma"),
        EventStreams.SourceDoc(2, "sA", "delta"),
        EventStreams.SourceDoc(3, "sB", "epsilon zeta"))
      val b2 = Seq(EventStreams.SourceDoc(4, "sA", "eta theta iota kappa"),
        EventStreams.SourceDoc(5, "sB", "lambda"))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val streamed = spark.table("card_stream").collect().map(key).toMap
      val batch = EventStreams.streamingDataCard((b1 ++ b2).toDF())
        .collect().map(key).toMap
      assert(streamed == batch)
      // hand check one source: sA has 3 docs of 3/1/4 words
      assert(streamed("sA")._1 == 3L && streamed("sA")._2 == 8L)
      assert(streamed("sA")._3 == 1L && streamed("sA")._4 == 4L)
    } finally q.stop()
  }

  test("the q152 mojibake report runs unchanged as a complete-mode stream and equals the batch report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the detector is per-row projections + one sum aggregation — no
    // cross-row state — so the BATCH operator itself is the streaming
    // monitor: same function, complete mode, one int64 row per source
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = graft.ops.WebPrep.mojibakeReport(
        input.toDF().withColumnRenamed("text", "mtext"))
      .writeStream.format("memory").queryName("moji_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(EventStreams.SourceDoc(1, "sA", "donâ€™t panic"),
        EventStreams.SourceDoc(2, "sA", "clean text"),
        EventStreams.SourceDoc(3, "sB", "cafÃ© bar"))
      val b2 = Seq(EventStreams.SourceDoc(4, "sA", "bad � byte"),
        EventStreams.SourceDoc(5, "sB", "more clean prose"))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
        (1 to 7).map(r.getLong).toList
      val streamed = spark.table("moji_stream").collect().map(key).toMap
      val batch = graft.ops.WebPrep.mojibakeReport(
        (b1 ++ b2).toDF().withColumnRenamed("text", "mtext"))
        .collect().map(key).toMap
      assert(streamed == batch)
      assert(streamed("sA").head == 3L && streamed("sA")(1) == 2L)
    } finally q.stop()
  }

  test("the q166 tail-repetition report runs unchanged as a complete-mode stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = graft.ops.TextOps.tailRepetition(
        input.toDF().withColumnRenamed("text", "ttext"))
      .writeStream.format("memory").queryName("tail_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(EventStreams.SourceDoc(1, "sA", "fine text here"),
        EventStreams.SourceDoc(2, "sA", "bad loop loop loop loop loop"))
      val b2 = Seq(EventStreams.SourceDoc(3, "sA", "more clean words"))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
        (1 to 4).map(r.getLong).toList
      val streamed = spark.table("tail_stream").collect().map(key).toMap
      val batch = graft.ops.TextOps.tailRepetition(
        (b1 ++ b2).toDF().withColumnRenamed("text", "ttext"))
        .collect().map(key).toMap
      assert(streamed == batch)
      assert(streamed("sA") == List(3L, 1L, 3333L, 5L))
    } finally q.stop()
  }

  test("streaming weighted reservoir converges to the batch q107 kept set; later better arrivals evict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one source, contention: k low-quality docs arrive first, then k
    // all-stopword (weight-11) docs whose priorities are ~11x smaller
    val low = (0L until 10L).map(i => EventStreams.SourceDoc(i, "s0", "zz"))
    val high = (10L until 20L).map(i =>
      EventStreams.SourceDoc(i, "s0", ("the " * 100).trim))
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = EventStreams.streamingWeightedReservoir(spark, input.toDF())
      .writeStream.format("memory").queryName("reservoir")
      .outputMode("update").start()
    try {
      input.addData(low: _*)
      q.processAllAvailable()
      val after1 = spark.table("reservoir").collect()
      assert(after1.last.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("kept")
        .map(_.getLong(0)).toSet == (0L until 10L).toSet,
        "first batch fills the reservoir with the only candidates")
      input.addData(high: _*)
      q.processAllAvailable()
      // update mode: the LAST emitted row per source is the current state
      val kept = spark.table("reservoir").collect().last
        .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("kept")
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val batchKept = graft.ops.Scrub.weightedSample(
        (low ++ high).map(d => (d.doc_id, d.source, d.text))
          .toDF("doc_id", "source", "text"))
        .orderBy("rk").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(kept.toSeq == batchKept.toSeq,
        "streamed reservoir equals the batch sample, in rank order")
      // eviction really happened: at least one low doc left the reservoir
      assert(kept.map(_._1).toSet.intersect((0L until 10L).toSet).size < 10)
    } finally q.stop()
  }

  test("streaming DAU emits each closed day exactly once, equal to batch q197 over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, day: Int, hour: Int, user: Long) =
      EventStreams.FunnelEvent(id,
        Timestamp.valueOf(f"2024-01-0$day $hour%02d:00:00"), user, "view")
    // two complete days (user 1 twice on day 1 — distinct must not
    // double-count), then a day-4 arrival whose watermark (1 day lag)
    // passes both window ends and closes them
    val closed = Seq(ev(0, 1, 9, 1L), ev(1, 1, 12, 1L), ev(2, 1, 15, 2L),
      ev(3, 2, 10, 2L), ev(4, 2, 11, 3L))
    val input = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.streamingDailyUsers(input.toDF())
      .writeStream.format("memory").queryName("dau")
      .outputMode("append").start()
    try {
      input.addData(closed: _*)
      q.processAllAvailable()
      assert(spark.table("dau").count() == 0,
        "no window emits before the watermark passes its end")
      input.addData(ev(5, 4, 1, 9L))
      q.processAllAvailable()
      val streamed = spark.table("dau").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      // batch q197 over the SAME closed-day rows (its extra exact-audit
      // columns are batch-only by design — distinct aggregation is
      // unsupported in streaming, which is why the sketch exists)
      val dir = TestDirs.scratch("sdau")
      closed.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q197_daily_users_kmv")(spark, dir)
        .select("event_date", "n_events", "n_kept", "est_users")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
      assert(streamed == batch,
        "closed windows equal the batch per-day sketch rows")
      assert(streamed.map(_._1) == Seq("2024-01-01", "2024-01-02"))
      assert(streamed.map(_._4) == Seq(2L, 2L),
        "duplicate user events within a day do not double-count")
    } finally q.stop()
  }

  test("streaming funnel equals batch q198 staging under in-order arrival; jumbled batches cost nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // FunnelSpec's journeys: u1 clean 3-stage; u2 click BEFORE its view;
    // u3 purchase before its qualifying click; u4 view only; u5's
    // stage-3 purchase must be the one AFTER its click, not its global
    // min purchase
    val all = Seq(
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 30),
      (2L, "click", -5), (2L, "view", 0),
      (3L, "purchase", 5), (3L, "view", 0), (3L, "click", 20),
      (4L, "view", 0),
      (5L, "view", 0), (5L, "purchase", 5), (5L, "click", 10),
      (5L, "purchase", 20)
    ).zipWithIndex.map { case ((u, t, off), i) =>
      EventStreams.FunnelEvent(i.toLong, at(off), u, t) }
    // split by time so each user's events arrive in ts order ACROSS
    // batches (the documented equality contract); REVERSE each batch —
    // the per-batch sort restores order, so a jumbled batch costs nothing
    val batch1 = all.filter(_.ts.getTime <= at(5).getTime).reverse
    val batch2 = all.filter(_.ts.getTime > at(5).getTime).reverse
    val input = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.streamingFunnel(spark, input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // update mode: state is monotone (stage only grows), so the final
      // state per user is its max-stage row
      val fin = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
      assert(fin == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 3))
      // aggregate mirror: streamed stage counts equal batch q198 over
      // the same rows
      val dir = TestDirs.scratch("sfunnel")
      all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batchCounts = SparkEntry.queries("q198_funnel")(spark, dir)
        .orderBy(col("stage")).select("n_users")
        .collect().map(_.getLong(0)).toSeq
      val streamCounts = (1 to 3).map(k => fin.values.count(_ >= k).toLong)
      assert(streamCounts == batchCounts)
    } finally q.stop()
  }

  test("streaming transitions equal batch q199 counts under in-order arrival, tied instants included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // q199's tie fixture (ids 11/12 share an instant — the event_id
    // tie-break decides the transition) plus a cross-batch chain for u2
    val all = Seq(
      EventStreams.FunnelEvent(10L, at(0), 1L, "view"),
      EventStreams.FunnelEvent(11L, at(5), 1L, "click"),
      EventStreams.FunnelEvent(12L, at(5), 1L, "purchase"),
      EventStreams.FunnelEvent(20L, at(0), 2L, "view"),
      EventStreams.FunnelEvent(21L, at(60), 2L, "error"),
      EventStreams.FunnelEvent(22L, at(120), 2L, "view"))
    // split mid-chain for u2: the stored last event must bridge batches;
    // reverse each batch — the per-batch sort restores order
    val batch1 = all.filter(_.ts.getTime <= at(5).getTime).reverse
    val batch2 = all.filter(_.ts.getTime > at(5).getTime).reverse
    val input = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.streamingTransitions(spark, input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("transitions").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val dir = TestDirs.scratch("stransitions")
      all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q199_event_transitions")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        "per-pair transition counts equal the batch matrix")
      // the u2 error→view transition only exists if state bridged batches
      assert(streamed(("error", "view")) == 1L)
    } finally q.stop()
  }

  test("streaming session paths equal batch sessionPaths on closed sessions; watermark expiry closes the trailing session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // u1: two sessions (gap 45 min > 30) then a long session whose 9th+
    // events must truncate out of the path; u2: one session with a tied
    // instant (ids 31/32 — event_id breaks the order inside the path)
    val all = Seq(
      EventStreams.FunnelEvent(10L, at(0), 1L, "view"),
      EventStreams.FunnelEvent(11L, at(5), 1L, "click"),
      // 45-min gap: closes session 1 = view>click
      EventStreams.FunnelEvent(12L, at(50), 1L, "view"),
      EventStreams.FunnelEvent(13L, at(55), 1L, "purchase"),
      // 40-min gap: closes session 2; session 3 has 9 events → 8 kept
      EventStreams.FunnelEvent(14L, at(95), 1L, "view")) ++
      (0 until 8).map(i => EventStreams.FunnelEvent(15L + i,
        at(96 + i), 1L, if (i % 2 == 0) "click" else "view")) ++ Seq(
      EventStreams.FunnelEvent(30L, at(0), 2L, "view"),
      EventStreams.FunnelEvent(32L, at(10), 2L, "error"),
      EventStreams.FunnelEvent(31L, at(10), 2L, "click"))
    // split mid-session for u1 (state must bridge batches), then a far-
    // future tick advances the watermark past every open session's gap
    // horizon so the trailing sessions emit via EventTimeTimeout
    val batch1 = all.filter(_.ts.getTime <= at(50).getTime).reverse
    val batch2 = all.filter(_.ts.getTime > at(50).getTime).reverse
    // two ticks: a batch's timeouts fire against the PREVIOUS batch's
    // watermark, so tick1 (watermark → 73 min) fires u2's 40-min
    // horizon, and tick2 (watermark → ~9970 min from tick1) fires u1's
    // trailing 133-min horizon
    val tick1 = EventStreams.FunnelEvent(99L, at(10000), 9L, "view")
    val tick2 = EventStreams.FunnelEvent(100L, at(10001), 9L, "view")
    val input = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.streamingSessionPaths(spark, input.toDS())
      .writeStream.format("memory").queryName("sesspaths")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(tick1)
      q.processAllAvailable()
      input.addData(tick2)
      q.processAllAvailable()
      val streamed = spark.table("sesspaths").collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .filter(_._1 != 9L) // the watermark tick's own session stays open
        .groupBy(identity).view.mapValues(_.size).toMap
      // batch truth: Temporal.sessionPaths over the same rows
      val batchPaths = graft.ops.Temporal.sessionPaths(
          all.map(e => (e.event_id, e.ts, e.user_id, e.event_type))
            .toDF("event_id", "ts", "user_id", "event_type"))
        .collect().map(r => (r.getLong(0), r.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(streamed == batchPaths,
        "closed-session (user, path) multiset equals batch sessionPaths")
      // the 9-event session truncated to its first 8 types
      assert(streamed.keySet.exists { case (u, p) =>
        u == 1L && p.split(">").length == 8 && p.startsWith("view>click") })
      // the tied instant ordered by event_id: click (31) before error (32)
      assert(streamed.contains((2L, "view>click>error")))
    } finally q.stop()
  }

  test("session mirror under DISORDERED arrival: late events drop (never append), the timeout truncates mid-stream, and output equals the gap-fold over SURVIVORS") {
    // Pins the three engine semantics the corpus-scale disorder smoke's
    // survivor model rests on (SessionMirrorSmoke --disorder):
    //  (1) a row below the watermark is FILTERED before the state fold
    //      (not appended out of order) and counted in
    //      numRowsDroppedByWatermark;
    //  (2) with the late row gone the group has no data, so the armed
    //      event-time timeout fires MID-stream against the previous
    //      batch's watermark, emitting the truncated session;
    //  (3) a later in-time event reopens a fresh session — so emitted
    //      output is exactly Temporal.sessionPaths over the SURVIVING
    //      events, the equality the smoke asserts at corpus scale.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.streamingSessionPaths(spark, input.toDS())
      .writeStream.format("memory").queryName("sessdisorder")
      .outputMode("append").start()
    try {
      // b1: u1 opens at minute 0; u9's far-future tick drives the
      // watermark to 150 min
      input.addData(
        EventStreams.FunnelEvent(1L, at(0), 1L, "view"),
        EventStreams.FunnelEvent(90L, at(180), 9L, "view"))
      q.processAllAvailable()
      // processAllAvailable runs a no-data batch after b1 (watermark
      // propagation): u1's timeout horizon (minute 30) < 150 fires
      // THERE, emitting "view" truncated. b2's late filter then runs
      // against that previous batch's watermark (150 —
      // watermarkForLateEvents lags eviction by one batch,
      // SPARK-39931), so the minute-10 click is LATE → dropped, and
      // "view>click" can never appear
      input.addData(
        EventStreams.FunnelEvent(2L, at(10), 1L, "click"),
        EventStreams.FunnelEvent(91L, at(181), 9L, "view"))
      q.processAllAvailable()
      // b3: u1 reopens in-time (minute 200 > watermark 151); b4's tick
      // advances the watermark past its horizon → second "view" emits
      input.addData(EventStreams.FunnelEvent(3L, at(200), 1L, "view"))
      q.processAllAvailable()
      input.addData(EventStreams.FunnelEvent(92L, at(400), 9L, "view"))
      q.processAllAvailable()
      val u1 = spark.table("sessdisorder").collect()
        .map(r => (r.getLong(0), r.getString(1))).filter(_._1 == 1L).toSeq
      assert(u1.sorted == Seq((1L, "view"), (1L, "view")),
        "truncated session + reopened session; the late click never appends")
      // survivor-fold equality: batch sessionPaths over events MINUS
      // the dropped one reproduces the emitted multiset for u1
      val surv = Seq((1L, at(0), 1L, "view"), (3L, at(200), 1L, "view"))
        .toDF("event_id", "ts", "user_id", "event_type")
      val expect = graft.ops.Temporal.sessionPaths(surv).collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(u1.sorted == expect.sorted)
      // the engine's own accounting saw exactly the one late row
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 1L, s"numRowsDroppedByWatermark = $dropped")
    } finally q.stop()
  }

  test("streaming incremental dedup over initial base-key state reproduces batch q74 for every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // base corpus: two contents already ingested; their md5 keys arrive
    // as INITIAL STATE, the way a warm pipeline restores its checkpoint
    val baseTexts = Seq("alpha text", "beta text")
    val baseKeys = baseTexts.toDS().map(EventStreams.contentKey)
    val b1 = Seq(
      EventStreams.SourceDoc(100L, "srcA", "alpha text"), // in base
      EventStreams.SourceDoc(101L, "srcA", "gamma text"), // novel keeper
      EventStreams.SourceDoc(102L, "srcB", "gamma text"), // in-batch dup
      EventStreams.SourceDoc(103L, "srcB", "delta text")) // novel keeper
    val b2 = Seq(
      EventStreams.SourceDoc(104L, "srcA", "gamma text"), // cross-batch dup
      EventStreams.SourceDoc(105L, "srcB", "beta text"),  // in base
      EventStreams.SourceDoc(106L, "srcB", "epsilon text")) // novel keeper
    // batch q74 over a prefix of the ingest: same plan shape as the
    // oracle-checked query (min-doc_id keepers, anti-join vs base keys)
    def batchQ74(prefix: Seq[EventStreams.SourceDoc]) = {
      val newB = prefix.map(d => (d.doc_id, d.source, d.text))
        .toDF("doc_id", "source", "text")
        .select(col("doc_id"), col("source"), md5(col("text")).as("tkey"))
      val baseK = baseTexts.toDF("text").select(md5(col("text")).as("tkey"))
      val keepers = newB.groupBy(col("tkey"))
        .agg(min(col("doc_id")).as("keeper_id"),
          expr("min_by(source, doc_id)").as("source"))
      val novel = keepers.join(baseK, Seq("tkey"), "left_anti")
      (newB.groupBy(col("source")).count().collect()
         .map(r => r.getString(0) -> r.getLong(1)).toMap,
       keepers.groupBy(col("source")).count().collect()
         .map(r => r.getString(0) -> r.getLong(1)).toMap,
       novel.groupBy(col("source")).count().collect()
         .map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    def streamedCounts() = {
      val v = spark.table("ingest_verdicts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
          r.getBoolean(3)))
      (v.groupBy(_._2).view.mapValues(_.length.toLong).toMap,
       v.filter(_._3).groupBy(_._2).view.mapValues(_.length.toLong).toMap,
       v.filter(_._4).groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    }
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = EventStreams
      .streamingIncrementalDedup(spark, input.toDS(), baseKeys)
      .writeStream.format("memory").queryName("ingest_verdicts")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(streamedCounts() == batchQ74(b1),
        "after batch 1 the per-source (n_batch, n_unique, n_novel) " +
          "triples equal the batch operator on the same prefix")
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(streamedCounts() == batchQ74(b1 ++ b2),
        "after batch 2 the verdicts still aggregate to the batch answer")
      // the cross-batch duplicate was recognized: doc 104 is neither
      // kept nor novel even though it led micro-batch 2
      val v104 = spark.table("ingest_verdicts").collect()
        .find(_.getLong(0) == 104L).get
      assert(!v104.getBoolean(2) && !v104.getBoolean(3))
      // a base-corpus hit is kept (it IS the batch keeper for its key)
      // but never novel: doc 100
      val v100 = spark.table("ingest_verdicts").collect()
        .find(_.getLong(0) == 100L).get
      assert(v100.getBoolean(2) && !v100.getBoolean(3))
    } finally q.stop()
  }

  test("streaming winnow-decontam flags exactly batch q182's docs with equal counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def h56mod(s: String, m: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 14)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val ids = (0L until 300L)
    val trainIds = ids.filter(i => h56mod(s"split:$i", 10) < 8)
    val evalIds = ids.filter(i => h56mod(s"split:$i", 10) >= 8)
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def unique(i: Long) = (0 until 12).map(j => s"u${i}w$j").mkString(" ")
    val evalDocs = Seq(
      (evalIds(0), s"${unique(800)} $leaked ${unique(801)}"),
      (evalIds(1), unique(802) + " " + unique(803)))
    val trainDocs = Seq(
      (trainIds(0), s"${unique(900)} $leaked ${unique(901)}"),
      (trainIds(1), unique(904) + " " + unique(905)),
      (trainIds(2), s"${unique(906)} $leaked"))
    // the frozen eval fingerprint table a deployment ships to the gate
    val evalFps = graft.ops.TextOps
      .rowWinnowFps(evalDocs.toDF("doc_id", "text"))
      .select(col("fp")).distinct()
    val input = MemoryStream[(Long, String)]
    val q = EventStreams
      .streamingWinnowDecontam(
        input.toDF().toDF("doc_id", "text"), evalFps)
      .writeStream.format("memory").queryName("winnow_gate")
      .outputMode("complete").start()
    try {
      input.addData(trainDocs.take(2): _*)
      q.processAllAvailable()
      input.addData(trainDocs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("winnow_gate").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch q182 over the union corpus: its n_eval_fp per train doc
      val batch = graft.ops.TextOps
        .winnowDecontam((trainDocs ++ evalDocs).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(streamed == batch, s"streamed $streamed != batch $batch")
      assert(streamed.contains(trainIds(0)) && streamed.contains(trainIds(2)))
      assert(!streamed.contains(trainIds(1)), "clean doc must not flag")
    } finally q.stop()
  }

  test("streaming span-mask merges planted quotes into exactly batch q191's spans") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q191 fixture: quotes at 1-based word positions 4-11 and 30-37
    val evalText = (1 to 8).map(i => s"e$i").mkString(" ")
    val pad = (1 to 3).map(i => s"x$i").mkString(" ")
    val mid = (1 to 18).map(i => s"y$i").mkString(" ")
    val tail = (1 to 5).map(i => s"z$i").mkString(" ")
    val trainText = s"$pad $evalText $mid $evalText $tail"
    val clean = (1 to 9).map(i => s"c$i").mkString(" ")
    // the frozen eval gram table a deployment ships to the gate
    val evalGrams = graft.ops.TextOps
      .wordShingles(Seq((0L, evalText)).toDF("doc_id", "text"), 4)
      .select(col("s")).distinct()
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamingSpanMask(
        input.toDF().toDF("doc_id", "text"), evalGrams)
      .writeStream.format("memory").queryName("span_mask")
      .outputMode("complete").start()
    try {
      input.addData((1L, trainText), (2L, clean))
      q.processAllAvailable()
      val rows = spark.table("span_mask").collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 1L,
        "only the quoting doc may flag")
      val spans = rows.head.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // identical to the batch q191 spans for the same fixture
      // (SketchAuditSpec): (start, end, n_grams)
      assert(spans == Seq((4L, 11L, 5L), (30L, 37L, 5L)), s"spans $spans")
      assert(rows.head.getLong(2) == 2L, "n_spans")
      assert(rows.head.getLong(3) == 16L, "masked_words = 2 spans x 8")
      assert(!rows.head.getBoolean(4), "a normal doc must not be capped")
    } finally q.stop()
  }

  test("streaming span-mask caps a pathological fully-contaminated doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a doc that is ~90% verbatim eval text: the in-row span fold is
    // O(hits²) per doc, so hits are capped at SpanMaskHitCap and the
    // doc routes to quarantine via `capped` with a PREFIX mask — a doc
    // with 1000+ eval hits is not a mask-and-keep candidate
    val evalWords = (1 to 30).map(i => s"q$i")
    val evalText = evalWords.mkString(" ")
    val rep = 50  // 50 × 27 in-rep gram hits = 1350 > the 1024 cap
    val pathological = Seq.fill(rep)(evalText).mkString(" ")
    val evalGrams = graft.ops.TextOps
      .wordShingles(Seq((0L, evalText)).toDF("doc_id", "text"), 4)
      .select(col("s")).distinct()
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamingSpanMask(
        input.toDF().toDF("doc_id", "text"), evalGrams)
      .writeStream.format("memory").queryName("span_mask_cap")
      .outputMode("complete").start()
    try {
      input.addData((7L, pathological))
      q.processAllAvailable()
      val rows = spark.table("span_mask_cap").collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 7L)
      assert(rows.head.getBoolean(4), "the pathological doc must cap")
      // expected prefix mask: only IN-REP 4-grams hit (positions
      // 30k + j, j ∈ 1..27 — boundary grams mix reps and miss), the
      // first SpanMaskHitCap of them merged under overlap-or-abut
      val hits = (for (k <- 0 until rep; j <- 1 to 27)
        yield 30L * k + j).sorted.take(EventStreams.SpanMaskHitCap)
      val expSpans = hits.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.last._2 + 1 =>
          acc.init :+ ((acc.last._1, p + 3, acc.last._3 + 1))
        case (acc, p) => acc :+ ((p, p + 3, 1L))
      }
      val spans = rows.head.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(spans == expSpans, s"prefix spans $spans")
      assert(rows.head.getLong(2) == expSpans.size.toLong, "n_spans")
      assert(rows.head.getLong(3) ==
        expSpans.map(s => s._2 - s._1 + 1).sum, "masked_words")
    } finally q.stop()
  }

  test("streaming KMV vocab card equals the batch sketch per source (mergeable O(k) state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic fixture spanning BOTH regimes (the testdata corpus has a
    // ~31-term templated vocabulary per source at every SF, so it never
    // saturates k = 128): "big" carries 400 distinct tokens with heavy
    // cross-doc repetition (estimator path + in-buffer dedup), "small"
    // stays under k (exact path)
    val rows: Array[(Long, String, String)] =
      (0 until 10).map { d =>
        (d.toLong, "big",
          ((0 until 40).map(j => s"w${d * 40 + j}") ++
            (0 until 10).map(j => s"common$j")).mkString(" "))
      }.toArray :+ ((99L, "small", "a few tiny words"))
    val docs = spark.createDataFrame(rows.toSeq)
      .toDF("doc_id", "source", "text")
    val expected = EventStreams.streamingVocabCard(docs).collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2),
        r.getLong(3))).toMap
    val input = MemoryStream[(Long, String, String)]
    val q = EventStreams.streamingVocabCard(
        input.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("vocab_card")
      .outputMode("complete").start()
    try {
      // two micro-batches: the sketch must MERGE across batches, not
      // recompute — the stored state is the k-capped set itself
      input.addData(rows.take(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("vocab_card").collect()
        .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2),
          r.getLong(3))).toMap
      assert(got == expected,
        s"streamed sketches must equal batch (got ${got.size} sources)")
      // the sf0.001 corpus covers BOTH regimes: large sources saturate
      // the sketch (estimator path), small ones stay under k (exact
      // path) — require each so both branches are pinned
      assert(expected.values.exists(_._2 == 128L),
        "some source must saturate the sketch (estimator regime)")
      assert(expected.values.exists(_._2 < 128L),
        "some source must stay under k (exact-count regime)")
    } finally q.stop()
  }

  test("streaming bloom gate equals batch q75 per doc (stateless append projection)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus so the filter carries realistic density and the
    // stream exercises both flagged and clean docs
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // the frozen filter a deployment trains batch-side and ships
    val filterRow = graft.ops.TextOps.bloomFilterRowFor(docs)
    val expected = graft.ops.TextOps.bloomDecontam(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val training = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamingBloomGate(
        input.toDF().toDF("doc_id", "text"), filterRow)
      .writeStream.format("memory").queryName("bloom_gate")
      .outputMode("append").start()
    try {
      input.addData(training: _*)
      q.processAllAvailable()
      val got = spark.table("bloom_gate").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"streamed ${got.size} vs batch ${expected.size}")
      assert(got.nonEmpty, "fixture must flag at least one doc")
      assert(got.size < training.size,
        "clean docs must emit nothing — the gate filters, not annotates")
    } finally q.stop()
  }

  test("streaming DSIR scorer equals batch q178 per doc (stateless append projection)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // mixed stopword density so the target predicate splits the corpus
    val docs = Seq(
      (1L, "s0", "the cat sat on the mat and the dog slept by the door"),
      (2L, "s0", "quantum flux capacitor misaligned torque vector payload"),
      (3L, "s1", "a list of the best ways to cook rice and beans at home"),
      (4L, "s1", "gradient descent converges when the learning rate is small"),
      (5L, "s0", "zzz qqq vvv kkk jjj www uuu"),
      (6L, "s1", "it is what it is and that is all that it is")
    ).toDF("doc_id", "source", "text")
    // the frozen LUT a deployment trains batch-side and ships
    val lutRow = graft.ops.CorpusStats.dsirLutRow(docs)
    val expected = graft.ops.CorpusStats.dsirWeights(docs)
      .select("doc_id", "n_tokens", "w_units", "wpt_milli")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamingDsirScore(
        input.toDF().toDF("doc_id", "text"), lutRow)
      .writeStream.format("memory").queryName("dsir_score")
      .outputMode("append").start()
    try {
      // stream exactly the batch corpus — no re-typed literals to drift
      input.addData(
        docs.collect().map(r => r.getLong(0) -> r.getString(2)).toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("dsir_score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"streamed $got vs batch $expected")
      assert(got.size == 6, "every arriving doc scores — no state, no dedup")
    } finally q.stop()
  }
}
