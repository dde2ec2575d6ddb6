package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of the batch event-window family
  * (SURVEY.md §2b "Streaming"): the same logical shapes as
  * q23/q25, expressed over an unbounded source with watermarks and typed
  * state. The batch queries stay the oracle-checked source of truth; these
  * operators prove the engine's streaming execution path with identical
  * semantics.
  *
  * Scale notes: event-time aggregation state is partitioned by group key
  * (window start / user), so a 1000-executor cluster shards state
  * horizontally; the watermark bounds state size by evicting windows older
  * than the allowed lateness.
  */
object EventStreams {

  /** Hourly tumbling counts with a 10-minute watermark — the streaming
    * form of q23_hourly_tumbling. Append mode: a window emits once the
    * watermark passes its end. */
  def hourlyTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("hour_start"),
        col("n_events"), col("value_sum"))

  /** Session windows with a 30-minute inactivity gap — the streaming form
    * of q25_session_windows, using the built-in session_window (state
    * merges adjacent events; watermark closes sessions). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("value_sum"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, value_sum: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState —
    * the escape hatch for stateful logic the windowed aggregates can't
    * express (the reference's `$allKeys` tally, Porter.php:328-332, is
    * morally this shape). Update mode: each batch emits the refreshed
    * totals for the users it touched. */
  def runningUserTotals(spark: SparkSession, events: Dataset[UserEvent])
      : Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserRunning(userId, acc.n_events + 1,
              math.rint((acc.value_sum + e.value) * 100) / 100)
          }
          state.update(next)
          next
      }
  }

  final case class Doc(doc_id: Long, text: String)

  /** Streaming exact dedup — the unbounded form of q31: the FIRST
    * occurrence of each content passes through, every later duplicate
    * (same batch or any later batch) is dropped. Keyed state holds one
    * boolean per content hash; keying by the md5 of the text (not the
    * text itself) keeps the state store small and the shuffle key fixed-
    * width — at corpus scale the state shards horizontally by hash
    * across executors, exactly like the batch groupBy(text) shuffles.
    * flatMapGroupsWithState rather than dropDuplicates so the
    * keep-first-arrival semantics (and the doc that was kept) are
    * explicit and testable. */
  /** Hex md5 of the text — the fixed-width state/shuffle key. The digest
    * instance is per-thread (getInstance per row would allocate in the
    * keying hot path). */
  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private[graft] def contentKey(text: String): String = {
    val d = md5Digest.get()
    d.reset()
    new java.math.BigInteger(1,
      d.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toString(16)
  }

  def streamingDedup(spark: SparkSession, docs: Dataset[Doc]): Dataset[Doc] = {
    import spark.implicits._
    docs
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists || !batch.hasNext) Iterator.empty
          else {
            state.update(true)
            // min doc_id among same-batch duplicates: deterministic
            // regardless of partitioning, and matches q31's keeper rule
            Iterator.single(batch.minBy(_.doc_id))
          }
      }
  }

  /** Watermark-bounded streaming dedup — `dropDuplicatesWithinWatermark`
    * on the md5 content key over a frame carrying an event-time `ts`.
    * [[streamingDedup]] is EXACT but its keep-first state grows with the
    * distinct-content count forever (hence the RocksDB provider config);
    * this variant holds each key's state only for the watermark horizon,
    * trading completeness (duplicates farther apart than `delay` may BOTH
    * survive) for state bounded by the horizon's arrival rate. That is
    * the right configuration when duplicates cluster in time — publisher
    * retries, replayed partitions — the common production duplicate
    * shape. Same 32-byte-key discipline as q31: the shuffle carries
    * md5(text), never the text. */
  def streamingDedupBounded(docs: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_key", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_key")

  /** Per-key state of the incremental-ingest dedup: was the content in
    * the pre-existing base corpus, and has it already arrived in the
    * ingest stream itself. Two bits — the distinction q74 needs (a key
    * already in base still has a batch KEEPER, it just isn't NOVEL). */
  final case class IngestState(inBase: Boolean, seenInStream: Boolean)

  /** One verdict row per ingested document: `kept` marks the key's first
    * stream arrival (q74's `keepers` — one per distinct content in the
    * batch), `novel` marks a kept row whose content was absent from the
    * base corpus (q74's `novel` anti-join). */
  final case class IngestVerdict(doc_id: Long, source: String,
      kept: Boolean, novel: Boolean)

  /** Streaming mirror of q74's incremental-ingest dedup (VERDICT r8
    * item 8): the batch operator anti-joins a new batch's content keys
    * against the accumulated base corpus; here the base keys ARRIVE AS
    * INITIAL STATE (`flatMapGroupsWithState`'s initialState hook — the
    * state a warm 100 TB ingest pipeline restores from its checkpoint)
    * and each micro-batch's documents are judged on arrival. Per
    * arriving doc: first stream arrival of its content ⇒ `kept` (q74's
    * min-doc_id keeper when docs arrive in doc_id order — within one
    * micro-batch the group is sorted explicitly, across micro-batches
    * first-arrival wins, which IS insertion order); kept ∧ not-in-base ⇒
    * `novel`. Aggregating the verdicts per source reproduces q74's
    * (n_batch, n_unique, n_novel) row for any stream prefix —
    * StreamingSpec pins that prefix-equivalence. Scale shape: state is
    * one 2-bit flag per DISTINCT content md5, sharded by the same hash
    * the batch groupBy(tkey) shuffles on; run under
    * [[rocksDbStateStoreConf]] at corpus scale like [[streamingDedup]].
    * The md5 key (never the text) carries every exchange. */
  def streamingIncrementalDedup(spark: SparkSession,
      docs: Dataset[SourceDoc],
      baseKeys: Dataset[String]): Dataset[IngestVerdict] = {
    import spark.implicits._
    val init = baseKeys
      .map(k => (k, IngestState(inBase = true, seenInStream = false)))
      .groupByKey(_._1).mapValues(_._2)
    docs
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout, init) {
        (_: String, batch: Iterator[SourceDoc],
            state: GroupState[IngestState]) =>
          val prev = state.getOption
            .getOrElse(IngestState(inBase = false, seenInStream = false))
          val arrivals = batch.toSeq.sortBy(_.doc_id)
          if (arrivals.isEmpty) Iterator.empty
          else {
            state.update(prev.copy(seenInStream = true))
            arrivals.iterator.zipWithIndex.map { case (d, i) =>
              val kept = i == 0 && !prev.seenInStream
              IngestVerdict(d.doc_id, d.source, kept,
                kept && !prev.inBase)
            }
          }
      }
  }

  /** Streaming mirror of q182's winnowing decontamination — the online
    * ingest gate: incoming documents compute their winnowing sketch
    * per-row ([[graft.ops.TextOps.rowWinnowFps]] — the array-expression
    * form, since WindowExec is batch-only), stream-static equi-join
    * against the frozen eval-set fingerprint table, and aggregate
    * per-doc shared-fingerprint counts. Any doc that surfaces here
    * carries a ≥ WinnowK+WinnowW−1-token verbatim run from the held-out
    * set and must not enter training. Complete-mode state is one count
    * per FLAGGED doc — leaky docs only, a vanishing corpus fraction by
    * construction (the q73/CMS "Complete mode is correct" shape).
    * StreamingSpec pins equality with batch q182's n_eval_fp column. */
  def streamingWinnowDecontam(docs: DataFrame,
      evalFps: DataFrame): DataFrame =
    graft.ops.TextOps.rowWinnowFps(docs)
      .join(evalFps, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_fp"))

  /** Per-doc ceiling on hit positions entering [[streamingSpanMask]]'s
    * in-row span fold. The fold rebuilds its accumulator array per hit
    * (interpreted HOF), i.e. O(hits²) per doc worst-case — fine for
    * real contamination (tens of hits) but quadratic for a
    * pathological fully-contaminated doc at ingest (r12 verdict item
    * 6). Docs over the cap fold only their first [[SpanMaskHitCap]]
    * positions (a PREFIX of the true mask) and carry `capped = true`,
    * which routes them to quarantine wholesale — a doc with 1024+
    * eval-set hits is not a mask-and-keep candidate, it IS the leak. */
  val SpanMaskHitCap = 1024

  /** Streaming mirror of q191's span-level decontamination mask — the
    * online ingest form of surgical decontamination: incoming docs
    * explode positional 4-grams, stream-static equi-join against the
    * frozen eval gram set, and per doc the hit positions collapse to
    * maximal merged spans. The batch query's per-doc WINDOW (gaps-and-
    * islands) is batch-only machinery, so the merge here is an IN-ROW
    * fold over the doc's sorted hit positions (`aggregate` over
    * `sort_array(collect_list(p))` — deterministic after the sort,
    * identical overlap-or-abut rule: positions ≤ prev end + 1 extend
    * the open span), bounded per doc by [[SpanMaskHitCap]]. Output is
    * one row per FLAGGED doc with its spans array, span count,
    * masked-word total and the `capped` route flag — complete-mode
    * state is bounded by the leaky docs, a vanishing corpus fraction
    * (the q73 / winnow-gate shape). StreamingSpec pins per-doc
    * equality with batch q191 (uncapped docs) and the bounded
    * pathological path. */
  def streamingSpanMask(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    graft.ops.TextOps.positionalWordShingles(docs, 4)
      .withColumn("p", col("i") + lit(1L))
      .join(evalGrams, "s")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("p"))).as("ps_all"))
      .select(col("doc_id"),
        expr(s"slice(ps_all, 1, $SpanMaskHitCap)").as("ps"),
        (size(col("ps_all")) > SpanMaskHitCap).as("capped"))
      .select(col("doc_id"), expr(
        """aggregate(ps,
             cast(array() as array<struct<s: bigint, e: bigint, n: bigint>>),
             (acc, p) -> case
               when size(acc) = 0 or p > element_at(acc, -1).e + 1L
                 then concat(acc,
                   array(named_struct('s', p, 'e', p + 3L, 'n', 1L)))
               else concat(slice(acc, 1, size(acc) - 1),
                 array(named_struct('s', element_at(acc, -1).s,
                   'e', p + 3L, 'n', element_at(acc, -1).n + 1L)))
             end)""").as("spans"), col("capped"))
      .select(col("doc_id"), col("spans"),
        expr("cast(size(spans) as bigint)").as("n_spans"),
        expr("aggregate(spans, 0L, (a, x) -> a + x.e - x.s + 1L)")
          .as("masked_words"), col("capped"))

  /** Streaming DSIR scorer — the ingest-time form of q178 (data
    * selection at the crawl frontier, Xie et al. 2023): arriving docs
    * score against a FROZEN importance LUT (one broadcast row carrying
    * the dense per-bucket whole-bit deltas,
    * [[graft.ops.CorpusStats.dsirLutRow]]) as a PURE PER-ROW
    * projection — zero streaming state, Append mode, no watermark
    * needed, so selection-at-ingest runs at wire speed on any number
    * of executors and the score of a doc never depends on what else is
    * in its micro-batch. Same md5 bucketing, int64 word-delta sum and
    * sign-split milli division as the batch weights, so a doc scored
    * here equals its batch q178 row exactly (StreamingSpec pins
    * (doc_id, n_tokens, w_units, wpt_milli) equality). */
  def streamingDsirScore(docs: DataFrame, lutRow: DataFrame): DataFrame = {
    import graft.ops.CorpusStats.DsirBuckets
    graft.expr.Md5Hash56.register(docs.sparkSession)
    // FREEZE the LUT for real: a raw crossJoin against the trainer's
    // plan would re-run both corpus passes EVERY micro-batch (static
    // sides are re-evaluated per batch, and the trainer's internal
    // persist is drained after the session's first action). Collecting
    // here is one row holding one 1024-long array — the bounded
    // checkpoint a deployment ships to its ingest gate — and the
    // LocalRelation it becomes costs nothing per batch.
    val frozen = lutRow.sparkSession.createDataFrame(
      java.util.Arrays.asList(lutRow.collect(): _*), lutRow.schema)
    docs
      // batch q178 drops null-text docs (their ws explodes to nothing,
      // so the weight join never sees them) — mirror that, instead of
      // emitting a null-scored row the batch side never produces
      .filter(col("text").isNotNull)
      .withColumn("ws", split(lower(col("text")), " +"))
      .crossJoin(broadcast(frozen))
      .select(col("doc_id"),
        expr("cast(size(ws) as bigint)").as("n_tokens"),
        expr(
          s"""aggregate(ws, 0L, (acc, w) -> acc + element_at(lut,
                cast(graft_md5_56(w) % $DsirBuckets as int) + 1))""")
          .as("w_units"))
      .withColumn("wpt_milli", expr(
        """CASE WHEN w_units < 0
             THEN -((-w_units) * 1000 div n_tokens)
             ELSE w_units * 1000 div n_tokens END"""))
  }

  /** Streaming bloom decontamination gate — the ingest-time form of
    * q75: arriving docs count their distinct 4-grams that hit the
    * FROZEN eval bloom filter (one collect'd row: m + the dense packed
    * word array, trained once by
    * [[graft.ops.TextOps.bloomFilterRowFor]]) and pass through with
    * their contamination count when any gram hits. Same freeze
    * rationale as the DSIR scorer above — a raw crossJoin against the
    * trainer's plan re-runs the eval shingle explode and filter build
    * EVERY micro-batch; the frozen row is the bounded artifact a crawl
    * frontier ships to its gate. The per-doc count is an IN-ROW
    * `aggregate` over the doc's own distinct-shingle array probing
    * [[graft.expr.BloomProbe]] per gram — a PURE PER-ROW projection:
    * zero streaming state, Append mode, no watermark, a doc's verdict
    * never depends on its micro-batch. Docs with no flagged gram emit
    * nothing, exactly like batch q75's post-filter groupBy
    * (StreamingSpec pins per-doc (doc_id, n_flagged) equality). */
  def streamingBloomGate(docs: DataFrame, filterRow: DataFrame): DataFrame = {
    graft.expr.BloomProbe.register(docs.sparkSession)
    val frozen = filterRow.sparkSession.createDataFrame(
      java.util.Arrays.asList(filterRow.collect(): _*), filterRow.schema)
    docs
      .filter(col("text").isNotNull)
      .withColumn("words", split(lower(col("text")), " +"))
      .filter(size(col("words")) >= 4)
      .withColumn("grams", graft.ops.TextOps.shingleExpr(4))
      .crossJoin(broadcast(frozen))
      .select(col("doc_id"), expr(
        """aggregate(grams, 0L, (acc, s) ->
             acc + if(graft_bloom_probe(s, bloom, m), 1L, 0L))""")
        .as("n_flagged"))
      .filter(col("n_flagged") > 0)
  }

  /** Stream-stream interval join — the unbounded form of q63's
    * view→purchase conversion: each purchase matches the same user's
    * views from the preceding hour. Both sides MUST carry watermarks and
    * the join MUST have a time-range predicate: together they let Spark
    * evict buffered rows once `view_ts + 1h + lateness` passes, so the
    * join state is bounded by the interval, not the stream length. The
    * equi key (`user_id`) carries the shuffle — the same
    * "equi-keys-carry-the-join" rule as the batch range join (q26). */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    v.join(p,
        col("v_user") === col("p_user") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("v_user").as("user_id"), col("view_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Streaming count-min sketch over a (doc_id, text) document stream —
    * the unbounded form of q73's frequency sketch, and the canonical
    * case where Complete output mode is CORRECT at corpus scale: the
    * aggregation state is the sketch itself, bounded at depth × width
    * cells (4×1024 int64s = 32 KiB) no matter how many terms stream
    * through. Exactly the same salted md5 bucketing as the batch sketch
    * ([[graft.ops.CorpusStats]]), so a batch-built and a stream-built
    * sketch over the same documents are cell-for-cell identical
    * (StreamingSpec pins this). */
  def streamingCountMin(docs: DataFrame): DataFrame = {
    import graft.ops.CorpusStats
    graft.expr.Md5Hash56.register(docs.sparkSession)
    val buckets = (0 until CorpusStats.CmsDepth)
      .map(r => s"$r, ${CorpusStats.bucketSpark(r)}").mkString(", ")
    docs
      .select(explode(split(lower(col("text")), " +")).as("term"))
      .selectExpr(s"stack(${CorpusStats.CmsDepth}, $buckets) AS (r, bucket)")
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  final case class CandPair(da: Long, db: Long)

  /** Per-band streaming state: every member id seen so far (bounded by
    * the hot-band cap — the band stops emitting and drops its member
    * list the moment it crosses) plus the running arrival count. */
  final case class BandState(members: Seq[Long], seen: Long)

  /** Streaming MinHash near-dup candidates — the unbounded companion of
    * q33. Each arriving document is banded PER ROW (expression-only
    * signatures, [[graft.ops.Dedup.rowMinhashBands]] — bitwise identical
    * to the batch bands, no stateful aggregation needed), and state per
    * (band_idx, band_val) key holds the band's member ids seen so far.
    * A newcomer emits a candidate pair against EVERY stored member (and
    * earlier arrivals of its own batch), so below the cap the streamed
    * pair SET equals the batch operator's all-within-band collisions —
    * full batch recall, spec-pinned — where the round-6 single-anchor
    * state missed pairs between two docs that both arrived after the
    * anchor and shared only that band. As on the batch path before its
    * distinct(), a pair surfaces once per colliding band (≤ the band
    * count, 4); the exact-verify consumer dedups either way.
    *
    * The one remaining deviation is NON-RETRACTION at the cap: the
    * [[graft.ops.Dedup.HotBandCap]] analog fires the moment the
    * POST-batch count crosses the cap — the band then emits nothing from
    * that batch onward and its member list is dropped (a first-batch
    * overflow emits zero pairs, exactly like the batch path, which drops
    * the band wholesale) — but pairs already emitted in earlier,
    * under-cap batches cannot be retracted. A pair emitted while its
    * band was under the cap is a batch band-collision pair AT EMISSION
    * TIME; if that band later crosses the cap, the batch path re-run
    * over the full corpus would drop the band (and the pair, unless some
    * other cold band covers it) while the stream retains it. That is
    * the streaming-side cost of append-mode output, documented rather
    * than hidden. State per distinct band value is ≤ cap member ids
    * (then a bare counter once hot) — the same bound class as the batch
    * path's group cap, and the RocksDB provider config below applies at
    * corpus scale exactly as for [[streamingDedup]]. */
  def streamingMinhashCandidates(spark: SparkSession, docs: DataFrame,
      cap: Int = graft.ops.Dedup.HotBandCap): Dataset[CandPair] = {
    import spark.implicits._
    graft.ops.Dedup.rowMinhashBands(docs)
      .as[(Long, Int, String)]
      .groupByKey { case (_, bi, bv) => (bi, bv) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: (Int, String), batch: Iterator[(Long, Int, String)],
            state: GroupState[BandState]) =>
          // sorted so within-batch emission order (and the stored member
          // order) is deterministic regardless of partitioning
          val arrivals = batch.map(_._1).toArray.sorted
          if (arrivals.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(BandState(Nil, 0L))
            val newSeen = st.seen + arrivals.length
            if (newSeen > cap) {
              // hot: stop emitting and free the member list — the count
              // alone keeps the band hot forever (it never shrinks)
              state.update(BandState(Nil, newSeen))
              Iterator.empty
            } else {
              val stored = scala.collection.mutable.ArrayBuffer
                .empty[Long] ++= st.members
              val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
              arrivals.foreach { d =>
                stored.foreach { m =>
                  if (m != d)
                    out += CandPair(math.min(m, d), math.max(m, d))
                }
                stored += d
              }
              state.update(BandState(stored.toSeq, newSeen))
              out.iterator
            }
          }
      }
  }

  /** Streaming per-source data card — the online form of q108's merged
    * card, and the payoff of that query's decomposability proof: because
    * every statistic merges (counts/sums by +, extremes by min/max, the
    * content signature by bit_xor), the card can be MAINTAINED by a
    * streaming aggregation whose state is exactly one row of int64s per
    * source — bounded by the source count, never the corpus (the q73/CMS
    * "Complete mode is correct" shape). A batch-built q108 card and a
    * stream-built one over the same documents agree column-for-column
    * (StreamingSpec pins it). */
  def streamingDataCard(docs: DataFrame): DataFrame = docs
    .select(col("source"),
      size(split(lower(col("text")), " +")).cast("long").as("nw"),
      expr("cast(conv(substring(md5(text), 1, 14), 16, 10) as long)")
        .as("h"))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"),
      min(col("nw")).as("min_tokens"), max(col("nw")).as("max_tokens"),
      expr("bit_xor(h)").as("xor_sig"))

  /** Streaming KMV vocabulary cardinality per source — the online form
    * of the q195/q196 sketch family: arriving docs explode to token
    * hashes and fold into the SAME bounded bottom-k aggregate
    * ([[graft.expr.KMinDistinct]], `graft_kmin`) the batch queries use.
    * The aggregate is MERGEABLE by construction (its buffer merge is
    * the identical capped insert), so it runs UNCHANGED in Complete
    * mode: the state Spark keeps per source between micro-batches is
    * the serialized k-capped set — O(k) longs per group, NEVER the
    * token stream or the vocabulary — and after any stream prefix the
    * stored sketch is bit-identical to the batch sketch over the same
    * prefix (order-insensitive: a set of minima). Emits per source the
    * sketch, kept count and the (k−1)·2^56 div h_(k) distinct estimate
    * (exact below k) — the online vocabulary-size monitor a crawl
    * dashboard reads next to the q108 data card. StreamingSpec pins
    * sketch-array equality with the batch aggregate. */
  def streamingVocabCard(docs: DataFrame): DataFrame = {
    graft.expr.Md5Hash56.register(docs.sparkSession)
    graft.expr.KMinDistinct.register(docs.sparkSession)
    docs
      .filter(col("text").isNotNull)
      .select(col("source"),
        explode(split(lower(col("text")), " +")).as("term"))
      .select(col("source"),
        expr("graft_md5_56(concat('vkmv:', term))").as("h"))
      .groupBy(col("source"))
      .agg(expr("graft_kmin(h, 128)").as("sk"))
      .select(col("source"), col("sk"),
        expr("cast(size(sk) as bigint)").as("n_kept"),
        expr(graft.expr.KMinDistinct.estimateSql("sk", 128))
          .as("est_vocab"))
  }

  /** Streaming daily-active-users — q197's mirror on the EVENT-TIME
    * axis: the same `graft_kmin` bounded sketch keyed by a 1-day
    * event-time window under a watermark, Append mode. Each day's row
    * emits exactly once, when the watermark passes the window end —
    * the finalize-and-publish shape a daily dashboard ingests, where
    * the vocab-card mirror is the revise-forever Complete-mode shape.
    * State per open window is the O(k=128)-long sketch buffer, bounded
    * whatever the user count, and the watermark retires it — this is
    * the production form q197's comment points at: the exact
    * countDistinct audit column is BATCH-side only (distinct
    * aggregation is unsupported in streaming anyway — the sketch is
    * what a stream can afford, which is the point of the sketch).
    * StreamingSpec pins per-closed-day equality (n_events, n_kept,
    * est_users) with batch q197 over the same rows. */
  def streamingDailyUsers(events: DataFrame, watermark: String = "1 day")
      : DataFrame = {
    graft.expr.Md5Hash56.register(events.sparkSession)
    graft.expr.KMinDistinct.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        expr("""graft_kmin(
             graft_md5_56(concat('dau:', cast(user_id as string))), 128)""")
          .as("sk"))
      .select(col("w.start").cast("date").as("event_date"),
        col("n_events"),
        expr("cast(size(sk) as bigint)").as("n_kept"),
        expr(graft.expr.KMinDistinct.estimateSql("sk", 128))
          .as("est_users"))
  }

  final case class SourceDoc(doc_id: Long, source: String, text: String)
  final case class Kept(doc_id: Long, weight: Long, priority: Long)
  final case class Reservoir(source: String, kept: Seq[Kept])

  /** Streaming weighted reservoir — the online form of q107's
    * quality-weighted sample. Priorities come from the SAME projection
    * as the batch operator ([[graft.ops.Scrub.weightedPriorities]] —
    * bit-identical weights and hash divisions, no stateful math), so the
    * state machine only maintains each source's k smallest (priority,
    * doc_id) pairs: merge the batch's arrivals into the stored list,
    * sort, truncate to k. A later arrival with a smaller priority EVICTS
    * an earlier member — exactly the reservoir semantics, and why this
    * is mapGroupsWithState in Update mode rather than append (the kept
    * set is revisable by construction; q107's batch window replays the
    * same decision over the full corpus). State per source is ≤ k
    * triples — bounded by config, never the corpus — and the emitted row
    * is the source's CURRENT reservoir, deterministic under any
    * partitioning because the merge sorts before truncating. */
  def streamingWeightedReservoir(spark: SparkSession, docs: DataFrame,
      k: Int = graft.ops.Scrub.WeightedSampleK): Dataset[Reservoir] = {
    import spark.implicits._
    graft.ops.Scrub.weightedPriorities(docs)
      .select(col("source"), col("doc_id"), col("weight"), col("priority"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[(String, Long, Long, Long)],
            state: GroupState[Seq[Kept]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
            batch.map { case (_, id, w, p) => Kept(id, w, p) })
            .sortBy(kp => (kp.priority, kp.doc_id)).take(k)
          state.update(merged)
          Reservoir(source, merged)
      }
  }

  final case class FunnelEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String)
  final case class FunnelStage(user_id: Long, stage: Int,
      t1: Option[java.sql.Timestamp], t2: Option[java.sql.Timestamp],
      t3: Option[java.sql.Timestamp])

  /** Streaming greedy funnel — q198's mirror with O(1) state per user.
    *
    * State is exactly the user's (t1, t2, t3) stage times; each batch's
    * events for the user are sorted by (ts, event_id) — so a jumbled
    * BATCH costs nothing — and folded through the same greedy
    * strictly-after rules as the batch query: the first view fixes t1,
    * the first click strictly after t1 fixes t2, the first purchase
    * strictly after t2 fixes t3. Update mode: each batch emits the
    * refreshed stage row for the users it touched.
    *
    * Equality contract (StreamingSpec pins it): the streamed stage
    * equals batch q198's staging over the same rows whenever each
    * user's events arrive in nondecreasing (ts, event_id) order ACROSS
    * batches — the warm-ingest contract q74's mirror documents. A view
    * arriving in a LATER batch than a click it would have enabled
    * cannot retro-stage the user (the click was already folded); batch
    * q198 re-reads the corpus and would. That is the inherent
    * batch/stream gap for retroactive minima, not a state-size trade:
    * closing it would mean every user retaining their full click
    * history, which is exactly the unbounded state this mirror refuses
    * to carry. */
  def streamingFunnel(spark: SparkSession, events: Dataset[FunnelEvent])
      : Dataset[FunnelStage] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[FunnelStage]) =>
          val prev = state.getOption.getOrElse(
            FunnelStage(uid, 0, None, None, None))
          var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
          batch.toSeq
            .sortWith((a, b) => a.ts.before(b.ts) ||
              (a.ts.equals(b.ts) && a.event_id < b.event_id))
            .foreach { e =>
              e.event_type match {
                case "view" if t1.isEmpty => t1 = Some(e.ts)
                case "click" if t1.nonEmpty && t2.isEmpty &&
                  e.ts.after(t1.get) => t2 = Some(e.ts)
                case "purchase" if t2.nonEmpty && t3.isEmpty &&
                  e.ts.after(t2.get) => t3 = Some(e.ts)
                case _ => ()
              }
            }
          val stage = Seq(t1, t2, t3).takeWhile(_.nonEmpty).size
          val next = FunnelStage(uid, stage, t1, t2, t3)
          state.update(next)
          next
      }
  }

  final case class LastEvent(ts: java.sql.Timestamp, event_id: Long,
      event_type: String)
  final case class Transition(from_type: String, to_type: String)

  /** Streaming mirror of q199's event-type transition matrix: per user,
    * every consecutive (ts, event_id)-ordered pair emits one
    * from→to transition row, with state = the user's LAST event only —
    * O(1) per user through any stream length (the funnel's state
    * discipline; the downstream matrix is a plain streaming count over
    * the emitted rows). Each batch sorts ITS OWN rows per user before
    * folding, so jumbled intra-batch order costs nothing.
    *
    * Equality contract (the [[streamingFunnel]] caveat, here made
    * sharper because transitions are order-SENSITIVE, not monotone):
    * emitted transitions equal batch q199 only while each user's events
    * arrive in (ts, event_id) order ACROSS batches. A late event that
    * precedes the stored last event appends as if it came next —
    * producing one transition the batch matrix doesn't have and missing
    * the one it interrupted; repairing that retroactively would mean
    * keeping each user's full event history, exactly the unbounded
    * state this mirror refuses. At ingest the fix is upstream (log
    * streams are per-user ordered by construction); the batch query
    * stays the oracle-checked truth. */
  def streamingTransitions(spark: SparkSession, events: Dataset[FunnelEvent])
      : Dataset[Transition] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[FunnelEvent], state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          batch.toSeq
            .sortWith((a, b) => a.ts.before(b.ts) ||
              (a.ts.equals(b.ts) && a.event_id < b.event_id))
            .foreach { e =>
              last.foreach(l => out += Transition(l.event_type, e.event_type))
              last = Some(LastEvent(e.ts, e.event_id, e.event_type))
            }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  final case class SessionState(last_us: Long, prefix: List[String])
  final case class SessionPath(user_id: Long, path: String,
      n_prefix_events: Int)

  /** Streaming mirror of q208's sessionized journeys: per user, events
    * fold into the CURRENT session's first-[[graft.ops.Temporal.SessionPathPrefix]]
    * event-type path; a ≥30-minute gap CLOSES the session and emits its
    * path (append mode), and the event-time timeout closes the trailing
    * open session once the WATERMARK passes its gap horizon — so every
    * session eventually emits exactly once, without an end-of-stream
    * flush. State per user is bounded by construction: the ≤ 8-element
    * type prefix plus the last event time — the q198/q199 state
    * discipline applied to the one event readout that previously had no
    * online form (r13 verdict item 6).
    *
    * Equality contract (StreamingSpec pins it): emitted (user, path)
    * rows equal batch [[graft.ops.Temporal.sessionPaths]] over the same
    * rows whenever each user's events arrive in nondecreasing
    * (ts, event_id) order across batches — the funnel/transition
    * contract — AND no user's arrival lags the stream's watermark past
    * its own gap horizon. The second condition is new here because,
    * unlike the funnel/transition mirrors, this one carries an
    * event-TIME timeout: cross-user skew (a far-future event from user
    * B advancing the watermark while user A's in-order events are
    * still in flight) can fire A's timeout early, emitting a truncated
    * session and late-dropping A's remaining in-order events. That is
    * inherent to any watermarked session close, not a state trade:
    * per-user watermarks don't exist, so the bound on cross-user
    * arrival skew IS the watermark delay (= the gap). A late event
    * older than the stored last event would likewise extend the wrong
    * session; the batch query stays the oracle-checked truth.
    *
    * The mirror applies its own watermark on `ts` (delay = the gap
    * itself) — EventTimeTimeout requires one, and the timeout is armed
    * at last_event + gap, clamped one ms past the current watermark so
    * a batch that arrives exactly at the horizon cannot arm a timeout
    * in the past. */
  def streamingSessionPaths(spark: SparkSession,
      events: Dataset[FunnelEvent], gapMinutes: Int = 30)
      : Dataset[SessionPath] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val gapUs = gapMs * 1000L
    val prefixCap = graft.ops.Temporal.SessionPathPrefix
    // the gap compares MICROseconds, exactly the batch rule
    // (unix_micros diff > gapUs opens a session); Timestamp carries the
    // sub-ms part in nanos, getTime only ms
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[SessionState]) =>
          def render(s: SessionState) =
            SessionPath(uid, s.prefix.reverse.mkString(">"), s.prefix.size)
          if (state.hasTimedOut) {
            val out = state.getOption.map(render)
            state.remove()
            out.iterator
          } else {
            val out = Seq.newBuilder[SessionPath]
            var cur = state.getOption
            batch.toSeq
              .sortWith((a, b) => a.ts.before(b.ts) ||
                (a.ts.equals(b.ts) && a.event_id < b.event_id))
              .foreach { e =>
                val us = micros(e.ts)
                cur match {
                  case Some(s) if us - s.last_us <= gapUs =>
                    // prefix is stored reversed (cons = O(1)); only the
                    // first prefixCap types are kept, like batch rn ≤ 8
                    cur = Some(SessionState(us,
                      if (s.prefix.size < prefixCap) e.event_type :: s.prefix
                      else s.prefix))
                  case Some(s) =>
                    out += render(s)
                    cur = Some(SessionState(us, List(e.event_type)))
                  case None =>
                    cur = Some(SessionState(us, List(e.event_type)))
                }
              }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  s.last_us / 1000L + gapMs))
            }
            out.result().iterator
          }
      }
  }

  /** State-store configuration for running [[streamingDedup]] against a
    * corpus-scale stream. The state is deliberately tiny per key (one
    * boolean per content md5) but the KEY COUNT is the corpus
    * cardinality — billions of entries at 100 TB — and Spark's default
    * HDFS-backed provider keeps every key of every partition's store
    * ON-HEAP in the executor, so heap, not disk, becomes the ceiling.
    * The RocksDB provider (shipped with Spark) keeps the working set in
    * native memory + local SST files and checkpoints incrementally via
    * changelog files, which is what an unbounded keep-first dedup needs:
    *
    *   - `providerClass` → RocksDB: state lives off-heap/on-disk per
    *     executor, sharded by the same groupByKey hash as today;
    *   - changelog checkpointing → each commit uploads only the delta,
    *     not a full SST snapshot (a full snapshot per batch at billions
    *     of keys would dominate batch time);
    *   - `compactOnCommit` stays default (false): the dedup workload is
    *     write-once-read-rarely per key, background compaction suffices.
    *
    * Apply on the SparkSession (or spark-submit --conf) BEFORE the query
    * starts; the provider is per-query-run and cannot change across a
    * checkpoint's lifetime. StreamingSpec runs the dedup under this exact
    * map to pin that the wiring works. */
  val rocksDbStateStoreConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Output-mode pairing used by the specs and any production writer. */
  val appendMode: OutputMode = OutputMode.Append()
  val updateMode: OutputMode = OutputMode.Update()
}
