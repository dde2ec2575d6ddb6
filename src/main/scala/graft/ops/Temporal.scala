package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryDef, Tables}

/** Batch analogs of the streaming window family (SURVEY.md §2b row
  * "Streaming"), plus the time-shaped joins (range join, as-of join).
  *
  * The as-of join is deliberately the composition form (union + running
  * `last(...ignoreNulls)` window) rather than a per-key loop: one shuffle
  * on the partition key, then a single ordered pass per partition — the
  * scalable distributed as-of. The same plan shape serves 100 TB: shuffle
  * by user, sort by time within partition, no broadcast or N² anywhere.
  */
object Temporal {

  /** Path prefix cap for [[sessionPaths]]/q208: only a session's first
    * 8 events render into its path — the prefix that distinguishes
    * journey SHAPES; longer sessions truncate, deliberately. */
  val SessionPathPrefix = 8

  /** The q223 candidate session gaps, in seconds — 5 m, 15 m, the
    * shipped 30 m (q25/q208), 1 h, 2 h. One constant feeds BOTH the
    * Spark conditional aggregate and the generated oracle SQL (the
    * q195 estimateSql discipline: grid drift between engines is
    * impossible by construction). Declared BEFORE `defs`, whose oracle
    * strings interpolate it eagerly at object init. */
  val SessionGapSweepSeconds: Seq[Long] = Seq(300L, 900L, 1800L, 3600L, 7200L)

  /** q208's sessionization + path rendering, factored to object scope so
    * the streaming mirror's batch-equivalence spec
    * (StreamingSpec ↔ [[graft.streaming.EventStreams.streamingSessionPaths]])
    * pins against THE batch definition instead of a re-derivation:
    * 30-minute-gap sessions per user (q25's rule, (ts, event_id)
    * ordering), each rendered as the '>'-joined event-type path of its
    * first [[SessionPathPrefix]] events. Output one row per
    * (user_id, session_id) with the path string. The rn ≤ prefix filter
    * runs BEFORE collect_list, so per-session state is ≤ 8 structs by
    * construction. Input needs (user_id, ts, event_id, event_type). */
  def sessionPaths(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_us",
        lag(unix_micros(col("ts")), 1).over(byTime))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess"))
        .over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= SessionPathPrefix)
      .groupBy(col("user_id"), col("session_id"))
      .agg(expr("""array_join(transform(
             array_sort(collect_list(struct(ts, event_id, event_type))),
             x -> x.event_type), '>')""").as("path"))
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- tumbling window over event time (window() → 1h buckets) ----
    "q23_hourly_tumbling" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("value_sum"),
            countDistinct(col("user_id")).as("n_users"))
          .select(col("window.start").as("hour_start"),
            col("n_events"), col("value_sum"), col("n_users"))
          .orderBy(col("hour_start")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
               count(*) AS n_events,
               round(sum(value), 2) AS value_sum,
               count(DISTINCT user_id) AS n_users
             FROM events
             GROUP BY hour_start
             ORDER BY hour_start""")),

    // ---- sliding window (1h window, 30min slide → 2 windows/event) ----
    "q24_sliding_windows" -> QueryDef(
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("value_sum"))
          .select(col("window.start").as("win_start"),
            col("n_events"), col("value_sum"))
          .orderBy(col("win_start")),
      Some("""SELECT win_start, count(*) AS n_events,
               round(sum(value), 2) AS value_sum
             FROM (SELECT make_timestamp(
                     (CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 1800000000)
                       AS BIGINT) - k) * 1800000000) AS win_start,
                   value
                   FROM events, unnest([0, 1]) AS u(k))
             GROUP BY win_start
             ORDER BY win_start""")),

    // ---- session windows: 30-min inactivity gap, lag + running sum ----
    "q25_session_windows" -> QueryDef(
      (s, dir) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000 * 1000
        Tables.load(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTime))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_sess"))
            .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("value_sum"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""WITH marked AS (
               SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
                 CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w IS NULL
                        OR epoch_us(CAST(ts AS TIMESTAMP))
                           - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                           > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id)
             ),
             sessioned AS (
               SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM marked
             )
             SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS value_sum
             FROM sessioned
             GROUP BY user_id, session_id
             ORDER BY user_id, session_start""")),

    // ---- range join: equi key + date-interval predicate ----
    "q26_shipped_within_30d" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity")).as("qty_sum"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
               sum(l_quantity) AS qty_sum
             FROM orders JOIN lineitem
               ON o_orderkey = l_orderkey
              AND l_shipdate >= o_orderdate
              AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
             GROUP BY o_orderpriority
             ORDER BY o_orderpriority""")),

    // ---- as-of join: each purchase matched to the user's latest prior
    //      signup. Oracle uses DuckDB's native ASOF JOIN; the Spark plan is
    //      the distributed merge form (one shuffle by user, running
    //      last-non-null over time order). Tie note: a signup sharing the
    //      exact same microsecond as a purchase is ordered by event_id on
    //      the Spark side but always included by ASOF's >= — unobservable
    //      at µs resolution in this data. ----
    "q27_purchase_after_signup" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .filter(col("event_type").isin("signup", "purchase"))
          .withColumn("last_signup_ts",
            last(when(col("event_type") === "signup", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("last_signup_ts"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id,
               s.ts AS last_signup_ts
             FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'purchase') p
             ASOF LEFT JOIN
                  (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'signup') s
               ON p.user_id = s.user_id AND p.ts >= s.ts
             ORDER BY p.event_id""")),

    // ---- event-sequence conversion: users whose first purchase follows
    //      their first view (ORDER of events matters, not mere presence).
    //      Two filtered min-aggregations on the same shuffle key + one
    //      broadcast-size comparison row — at 100 TB the event scan is the
    //      only heavy stage and both aggregates are map-side combinable.
    //      Tie rule pinned: a purchase at the exact same µs as the first
    //      view does NOT count (strict >). ----
    "q63_conversion" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
        val converted = ev.filter(col("event_type") === "purchase")
          .join(firstView, "user_id")
          .filter(col("ts") > col("first_view"))
          .select(col("user_id")).distinct()
        firstView.agg(count(lit(1)).as("n_viewers"))
          .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
          .withColumn("conversion_rate",
            round(col("n_converted") * lit(1.0) / col("n_viewers"), 4))
      },
      Some("""WITH fv AS (
               SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_view
               FROM events WHERE event_type = 'view'
               GROUP BY user_id),
             conv AS (
               SELECT DISTINCT e.user_id
               FROM events e JOIN fv USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND CAST(e.ts AS TIMESTAMP) > fv.first_view)
             SELECT (SELECT count(*) FROM fv) AS n_viewers,
               (SELECT count(*) FROM conv) AS n_converted,
               round((SELECT count(*) FROM conv) * 1.0
                 / (SELECT count(*) FROM fv), 4) AS conversion_rate""")),

    // ---- weekly retention cohorts: users bucketed by first-seen week,
    //      retention = the fraction of each cohort active k weeks later.
    //      The classic warehouse read-out of an event stream. Plan: two
    //      user_id-keyed shuffles (first-seen min + distinct active
    //      weeks), then a map-side-combinable (cohort, offset) rollup;
    //      the per-cohort sizes are a tiny frame joined back (broadcast
    //      at any scale — there are only as many cohorts as weeks).
    //      Retention divides two exact int64 counts — one IEEE division,
    //      no float aggregation anywhere; both engines truncate weeks to
    //      the same Monday. ----
    "q72_retention_cohorts" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
        val active = ev.distinct()
        val sizes = cohort.groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("cohort_users"))
        active.join(cohort, "user_id")
          .withColumn("week_offset", expr("datediff(wk, cohort_wk) div 7"))
          .groupBy(col("cohort_wk"), col("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), "cohort_wk")
          .withColumn("retention",
            round(col("n_active") * lit(1.0) / col("cohort_users"), 4))
          .select(col("cohort_wk").cast("date").as("cohort_week"),
            col("week_offset"), col("cohort_users"), col("n_active"),
            col("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH ev AS (
               SELECT user_id,
                 date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
               FROM events),
             cohort AS (
               SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
             active AS (SELECT DISTINCT user_id, wk FROM ev),
             sizes AS (
               SELECT cohort_wk, count(*) AS cohort_users
               FROM cohort GROUP BY cohort_wk),
             ret AS (
               SELECT c.cohort_wk,
                 date_diff('day', c.cohort_wk, a.wk) // 7 AS week_offset,
                 count(*) AS n_active
               FROM active a JOIN cohort c USING (user_id)
               GROUP BY 1, 2)
             SELECT CAST(r.cohort_wk AS DATE) AS cohort_week, r.week_offset,
               s.cohort_users, r.n_active,
               round(r.n_active * 1.0 / s.cohort_users, 4) AS retention
             FROM ret r JOIN sizes s USING (cohort_wk)
             ORDER BY cohort_week, week_offset""")),

    // ---- EVENT-TYPE TRANSITION MATRIX: per user, events in (ts,
    //      event_id) order — the id tie-break makes the row stream
    //      deterministic even under equal timestamps — and every
    //      consecutive pair counts one (from_type → to_type)
    //      transition; the row-normalized probabilities (int64 basis
    //      points) are the first-order Markov readout of user journeys
    //      (which step follows which, the sequence-level structure the
    //      funnel collapses). Scale: ONE scan → a user_id-keyed window
    //      (per-user sort is the declared cost of sequence analytics —
    //      partitioned, never a global sort) → a map-side-combinable
    //      (from, to) rollup whose output is ≤ |types|² rows; the
    //      normalizing window runs on that constant-size frame. ----
    "q199_event_transitions" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n_transitions"))
          .withColumn("p_bp", expr(
            """n_transitions * 10000L div
               sum(n_transitions) OVER (PARTITION BY from_type)"""))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH o AS (
               SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
               FROM events),
             t AS (
               SELECT event_type AS from_type, next_type AS to_type,
                 CAST(count(*) AS BIGINT) AS n_transitions
               FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
             SELECT from_type, to_type, n_transitions,
               n_transitions * 10000
                 // CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                        AS BIGINT) AS p_bp
             FROM t ORDER BY from_type, to_type""")),

    // ---- LAST-TOUCH ATTRIBUTION: each purchase credits the user's
    //      most recent STRICTLY-PRIOR non-purchase event (earlier
    //      purchases are transparent — attribution looks through them
    //      to the last real touch; a purchase with no prior touch
    //      lands in 'none'). The marketing-analytics counterpart of
    //      q198's funnel: which channel the conversion is credited to,
    //      with the credited share in basis points and the mean
    //      touch→purchase gap in int64 microseconds. Scale: ONE
    //      user-partitioned window over the event stream (the q199
    //      shape — last(ignoreNulls) over an unbounded-preceding rows
    //      frame is streaming-evaluable in one pass per user, no self
    //      join, no per-user state beyond the running last touch),
    //      then a map-side ≤|types|-row rollup; the share window runs
    //      on that constant-size frame. ----
    "q201_last_touch_attribution" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("touch_type",
            when(col("event_type") =!= "purchase", col("event_type")))
          .withColumn("touch_ts",
            when(col("event_type") =!= "purchase", col("ts")))
          .withColumn("attr_type",
            last(col("touch_type"), ignoreNulls = true).over(w))
          .withColumn("attr_ts",
            last(col("touch_ts"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("attr_type"), lit("none")).as("attributed"))
          .agg(count(lit(1)).as("n_purchases"),
            coalesce(sum(expr("unix_micros(ts) - unix_micros(attr_ts)")),
              lit(0L)).as("d"))
          .select(col("attributed"), col("n_purchases"),
            expr("n_purchases * 10000L div sum(n_purchases) OVER ()")
              .as("share_bp"),
            expr("d div greatest(n_purchases, 1L)")
              .as("avg_us_to_convert"))
          .orderBy(col("attributed"))
      },
      Some("""WITH o AS (
               SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
                 event_type,
                 CASE WHEN event_type <> 'purchase' THEN event_type END
                   AS touch_type,
                 CASE WHEN event_type <> 'purchase'
                   THEN CAST(ts AS TIMESTAMP) END AS touch_ts
               FROM events),
             a AS (
               SELECT user_id, t, event_type,
                 last_value(touch_type IGNORE NULLS) OVER w AS attr_type,
                 last_value(touch_ts IGNORE NULLS) OVER w AS attr_ts
               FROM o
               WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             SELECT coalesce(attr_type, 'none') AS attributed,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(count(*) AS BIGINT) * 10000
                 // CAST(sum(count(*)) OVER () AS BIGINT) AS share_bp,
               CAST(coalesce(sum(epoch_us(t) - epoch_us(attr_ts)), 0)
                 AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1)
                 AS avg_us_to_convert
             FROM a WHERE event_type = 'purchase'
             GROUP BY 1 ORDER BY 1""")),

    // ---- K-STEP GREEDY FUNNEL: view → click → purchase, each stage
    //      strictly after the user's EARLIEST completion of the
    //      previous one (the standard product-analytics funnel; q63 is
    //      the 2-step special case). Spelled as CHAINED MINS — stage k
    //      is one type-filtered scan equi-joined to the 1-row-per-user
    //      stage-(k−1) frame, then min-aggregated — NOT as a per-user
    //      collect_list fold: the fold's state is the user's whole
    //      event history (unbounded for a power user at corpus scale),
    //      while the chained form carries O(1) state per user through
    //      every shuffle and pushes the event_type filter to the scan.
    //      Greedy-min semantics make the result order-independent, so
    //      no sort anywhere. Stage-to-stage gaps are int64 MICROSECOND
    //      sums (ts carries µs; unix_micros ↔ epoch_us agree exactly),
    //      averaged by floor division; conversions are int64 basis
    //      points. greatest(n,1) guards an empty stage. ----
    "q198_funnel" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def typed(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), col("ts"))
        val s1 = typed("view").groupBy(col("user_id"))
          .agg(min(col("ts")).as("t1"))
        val s2 = typed("click").join(s1, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
        val s3 = typed("purchase").join(s2, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
        s1.agg(count(lit(1)).as("n1"))
          .crossJoin(s2.agg(count(lit(1)).as("n2"),
            coalesce(sum(expr("unix_micros(t2) - unix_micros(t1)")), lit(0L))
              .as("d2")))
          .crossJoin(s3.agg(count(lit(1)).as("n3"),
            coalesce(sum(expr("unix_micros(t3) - unix_micros(t2)")), lit(0L))
              .as("d3")))
          .selectExpr(
            """stack(3,
                 1, 'view',     n1, 10000L, 10000L, 0L,
                 2, 'click',    n2, n2 * 10000L div greatest(n1, 1L),
                                    n2 * 10000L div greatest(n1, 1L),
                                    d2 div greatest(n2, 1L),
                 3, 'purchase', n3, n3 * 10000L div greatest(n2, 1L),
                                    n3 * 10000L div greatest(n1, 1L),
                                    d3 div greatest(n3, 1L))
               AS (stage, stage_name, n_users, conv_prev_bp, conv_s1_bp,
                   avg_us_from_prev)""")
          .orderBy(col("stage"))
      },
      Some("""WITH s1 AS (
               SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
               FROM events WHERE event_type = 'view' GROUP BY user_id),
             s2 AS (
               SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2,
                 min(s1.t1) AS t1
               FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click'
                 AND CAST(e.ts AS TIMESTAMP) > s1.t1
               GROUP BY e.user_id),
             s3 AS (
               SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3,
                 min(s2.t2) AS t2
               FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND CAST(e.ts AS TIMESTAMP) > s2.t2
               GROUP BY e.user_id),
             agg AS (
               SELECT
                 (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
                 (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
                 (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3,
                 (SELECT CAST(coalesce(sum(epoch_us(t2) - epoch_us(t1)), 0)
                    AS BIGINT) FROM s2) AS d2,
                 (SELECT CAST(coalesce(sum(epoch_us(t3) - epoch_us(t2)), 0)
                    AS BIGINT) FROM s3) AS d3)
             SELECT * FROM (
               SELECT 1 AS stage, 'view' AS stage_name, n1 AS n_users,
                 CAST(10000 AS BIGINT) AS conv_prev_bp,
                 CAST(10000 AS BIGINT) AS conv_s1_bp,
                 CAST(0 AS BIGINT) AS avg_us_from_prev FROM agg
               UNION ALL
               SELECT 2, 'click', n2, n2 * 10000 // greatest(n1, 1),
                 n2 * 10000 // greatest(n1, 1), d2 // greatest(n2, 1)
               FROM agg
               UNION ALL
               SELECT 3, 'purchase', n3, n3 * 10000 // greatest(n2, 1),
                 n3 * 10000 // greatest(n1, 1), d3 // greatest(n3, 1)
               FROM agg)
             ORDER BY stage""")),

    // ---- INTER-EVENT DWELL-TIME DISTRIBUTION: per user in (ts,
    //      event_id) order, the gap to the NEXT event, grouped by the
    //      event the user was dwelling on — the time-on-page /
    //      engagement readout, reported as exact interpolated
    //      p50/p90/p99 seconds per event type (q47's discipline:
    //      [[Percentiles]]' rank-based two-pass path stays distributed
    //      where Spark's built-in exact percentile would funnel each
    //      group's full gap set into one final-merge task; |types| = 5
    //      groups satisfies its low-cardinality guard). Gaps convert
    //      int64 µs → double seconds with one exact division — values
    //      under 2^53 µs convert losslessly, and both engines run the
    //      identical interpolation formula, so the 4-digit rounding is
    //      the same belt-and-suspenders as q47's. Scale: ONE
    //      user-partitioned window pass (the q199 shape), then the
    //      distributed percentile machinery; the 5-row percentile
    //      frame broadcasts back onto the counts. ----
    "q203_event_gap_percentiles" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .filter(col("next_ts").isNotNull)
          .select(col("event_type").as("after_type"),
            expr("""(unix_micros(next_ts) - unix_micros(ts))
                    / cast(1000000 as double)""").as("gap_s"))
        val pct = graft.ops.Percentiles.exactPercentiles(s, gaps,
          "after_type", "gap_s",
          Seq("median_gap_s" -> 0.5, "p90_gap_s" -> 0.9,
            "p99_gap_s" -> 0.99))
        gaps.groupBy(col("after_type"))
          .agg(count(lit(1)).as("n_gaps"))
          .join(broadcast(pct), "after_type")
          .select(col("after_type"), col("n_gaps"),
            round(col("median_gap_s"), 4).as("median_gap_s"),
            round(col("p90_gap_s"), 4).as("p90_gap_s"),
            round(col("p99_gap_s"), 4).as("p99_gap_s"))
          .orderBy(col("after_type"))
      },
      Some("""WITH o AS (
               SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t,
                 event_id,
                 lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_t
               FROM events),
             g AS (
               SELECT event_type AS after_type,
                 (epoch_us(next_t) - epoch_us(t)) / 1000000.0 AS gap_s
               FROM o WHERE next_t IS NOT NULL)
             SELECT after_type, CAST(count(*) AS BIGINT) AS n_gaps,
               round(quantile_cont(gap_s, 0.5), 4) AS median_gap_s,
               round(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
               round(quantile_cont(gap_s, 0.99), 4) AS p99_gap_s
             FROM g GROUP BY after_type ORDER BY after_type""")),

    // ---- DAILY ERROR-SPIKE DETECTION: each day's error count against
    //      the mean of the 7 PRIOR observed days (a rows-frame over
    //      the dense daily series — strictly-prior, so a spike never
    //      dampens its own baseline), ratio in int64 basis points,
    //      spike flag at ≥ 2× — the trailing-baseline anomaly readout
    //      an ops dashboard runs on every counter, in pure integer
    //      arithmetic (no stddev/float σ: a z-score needs a sqrt no
    //      rounding grid makes cross-engine-exact; the ratio rule is
    //      what int64 parity can certify). Days without a full 7-day
    //      history are withheld, not zero-padded. Scale: the heavy
    //      lift is the map-side-combinable date rollup; the trailing
    //      window runs UNPARTITIONED on the per-day frame, bounded by
    //      calendar days (3.7k rows per decade), never event volume. ----
    "q202_error_spikes" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("event_date")).rowsBetween(-7, -1)
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "error")
          .groupBy(col("ts").cast("date").as("event_date"))
          .agg(count(lit(1)).as("n_errors"))
          .withColumn("n_prior", count(lit(1)).over(w))
          .withColumn("trail_sum",
            coalesce(sum(col("n_errors")).over(w), lit(0L)))
          .filter(col("n_prior") === 7)
          .withColumn("trail_mean", expr("trail_sum div 7"))
          .withColumn("ratio_bp",
            expr("n_errors * 10000L div greatest(trail_mean, 1L)"))
          .select(col("event_date"), col("n_errors"), col("trail_mean"),
            col("ratio_bp"),
            expr("if(ratio_bp >= 20000, 1L, 0L)").as("is_spike"))
          .orderBy(col("event_date"))
      },
      Some("""WITH d AS (
               SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                 CAST(count(*) AS BIGINT) AS n_errors
               FROM events WHERE event_type = 'error' GROUP BY 1),
             t AS (
               SELECT event_date, n_errors,
                 CAST(count(*) OVER w AS BIGINT) AS n_prior,
                 coalesce(CAST(sum(n_errors) OVER w AS BIGINT), 0)
                   AS trail_sum
               FROM d
               WINDOW w AS (ORDER BY event_date
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             SELECT event_date, n_errors, trail_sum // 7 AS trail_mean,
               n_errors * 10000 // greatest(trail_sum // 7, 1) AS ratio_bp,
               CAST(CASE WHEN n_errors * 10000
                   // greatest(trail_sum // 7, 1) >= 20000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
             FROM t WHERE n_prior = 7 ORDER BY event_date""")),

    // ---- DAILY ACTIVE USERS via the KMV sketch, exact count and
    //      realized error alongside — the q195/q196 sketch pointed at
    //      the time axis (per-window distinct is THE cardinality
    //      problem event pipelines pay for daily: q23's exact
    //      countDistinct shuffles every (window, user) pair, while the
    //      bounded graft_kmin shuffles ≤ k longs per window whatever
    //      the user count). The exact count rides alongside at test
    //      scale as the q93/q102-style ground-truth audit: err_bp is
    //      the realized estimator error a deployment reads before
    //      trusting the sketch column alone. The sf0.01 data straddles
    //      k = 128 (daily distinct users 125-141), so BOTH the
    //      exact-window and estimator branches execute in one result;
    //      sf0.1 (1.3k/day) runs pure-estimator. Same int64 estimator
    //      discipline as q195; greatest(...,1) guards both divisions.
    //      ----
    "q197_daily_users_kmv" -> QueryDef(
      (s, dir) => {
        graft.expr.Md5Hash56.register(s)
        graft.expr.KMinDistinct.register(s)
        Tables.load(s, dir, "events")
          .groupBy(col("ts").cast("date").as("event_date"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_exact_users"),
            expr("""graft_kmin(
                 graft_md5_56(concat('dau:', cast(user_id as string))), 128)""")
              .as("sk"))
          .select(col("event_date"), col("n_events"), col("n_exact_users"),
            expr("cast(size(sk) as bigint)").as("n_kept"),
            expr(graft.expr.KMinDistinct.estimateSql("sk", 128))
              .as("est_users"))
          .withColumn("err_bp", expr(
            "abs(est_users - n_exact_users) * 10000 div greatest(n_exact_users, 1)"))
          .orderBy(col("event_date"))
      },
      Some("""WITH h AS (
               SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                 user_id,
                 CAST(('0x' || substr(md5('dau:' || CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h
               FROM events
             ), base AS (
               SELECT event_date, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users
               FROM h GROUP BY event_date
             ), r AS (
               SELECT event_date, h,
                 row_number() OVER (PARTITION BY event_date ORDER BY h) AS rn
               FROM (SELECT DISTINCT event_date, h FROM h)
             ), sk AS (
               SELECT event_date, CAST(count(*) AS BIGINT) AS n_kept,
                 CASE WHEN count(*) < 128 THEN count(*)
                      ELSE 9151314442816847872 // greatest(max(h), 1) END AS est_users
               FROM r WHERE rn <= 128 GROUP BY event_date
             )
             SELECT base.event_date, n_events, n_exact_users, n_kept,
               est_users,
               abs(est_users - n_exact_users) * 10000
                 // greatest(n_exact_users, 1) AS err_bp
             FROM base JOIN sk USING (event_date)
             ORDER BY event_date""")),

    // ---- EVENT-TYPE CO-OCCURRENCE LIFT: market-basket analysis over
    //      (user, day) baskets — which event types co-occur in a user's
    //      day MORE than their independent frequencies predict
    //      (lift > 1, i.e. > 10⁴ bp) and which avoid each other. The
    //      association readout behind "users who error also contact
    //      support" product questions; q199 reads ordered ADJACENCY,
    //      this reads unordered co-presence. All arithmetic int64: lift
    //      is STAGED floor division — ((n_ab·10⁴ div n_a)·NB) div n_b —
    //      spelled identically in both engines; the staging keeps every
    //      intermediate ≤ 10⁴·NB (safe to NB ~ 10¹⁴ baskets) where the
    //      naive n_ab·NB·10⁴ numerator overflows int64 at NB ~ 10⁹·√10.
    //      Scale: the distinct projects events to ≤ |types| rows per
    //      basket, so the self-join fans out ≤ C(|types|,2) = 10 rows
    //      per basket on the (user, day) key — one composite-key
    //      shuffle, never an all-pairs; the per-type and pair rollups
    //      are map-side-combinable with ≤ |types|² output rows, and the
    //      one-row basket total crossJoins on (the GateSpec-audited
    //      one-row pattern). ----
    "q206_event_type_lift" -> QueryDef(
      (s, dir) => {
        val b = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("d"),
            col("event_type"))
          .distinct()
        val nb = b.select(col("user_id"), col("d")).distinct()
          .agg(count(lit(1)).as("n_baskets"))
        val nt = b.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
        b.as("x")
          .join(b.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.d") === col("y.d") &&
              col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("type_a"),
            col("y.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(nt.select(col("event_type").as("type_a"),
            col("n_t").as("n_a"))), "type_a")
          .join(broadcast(nt.select(col("event_type").as("type_b"),
            col("n_t").as("n_b"))), "type_b")
          .crossJoin(nb)
          .select(col("type_a"), col("type_b"), col("n_both"),
            expr("n_both * 10000L div n_baskets").as("support_bp"),
            expr("(((n_both * 10000L) div n_a) * n_baskets) div n_b")
              .as("lift_bp"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH b AS (
               SELECT DISTINCT user_id,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type
               FROM events),
             nb AS (
               SELECT CAST(count(*) AS BIGINT) AS n_baskets
               FROM (SELECT DISTINCT user_id, d FROM b)),
             nt AS (
               SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
               FROM b GROUP BY event_type),
             p AS (
               SELECT x.event_type AS type_a, y.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n_both
               FROM b x JOIN b y
                 ON x.user_id = y.user_id AND x.d = y.d
                AND x.event_type < y.event_type
               GROUP BY 1, 2)
             SELECT type_a, type_b, n_both,
               n_both * 10000 // n_baskets AS support_bp,
               (((n_both * 10000) // na.n_t) * n_baskets) // nbt.n_t
                 AS lift_bp
             FROM p
             JOIN nt na ON na.event_type = type_a
             JOIN nt nbt ON nbt.event_type = type_b
             CROSS JOIN nb
             ORDER BY type_a, type_b""")),

    // ---- WEEKLY GROWTH ACCOUNTING: every active (user, week) is NEW
    //      (first week ever), RETAINED (also active the prior week) or
    //      RESURRECTED (returning after a gap); a user CHURNS into the
    //      week after their last activity (or after any gap > 1 week).
    //      The new+resurrected−churned decomposition is the standard
    //      growth ledger — net change per week explained by its three
    //      components, with the identity net = Δactive holding by
    //      construction. The churn row for the final active week lands
    //      one week PAST the last data week (that user base is churned
    //      AS OF then unless new data arrives) — deliberately kept.
    //      Scale: one distinct shuffle to (user, week), ONE
    //      user-partitioned window pass (lag+lead in the same frame),
    //      then two map-side-combinable week rollups full-outer-joined
    //      on the tiny calendar axis (52 rows/year whatever the event
    //      volume). No driver state, no self-join. ----
    "q207_growth_accounting" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
        val o = Tables.load(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
          .withColumn("prev", lag(col("wk"), 1).over(w))
          .withColumn("nxt", lead(col("wk"), 1).over(w))
        val act = o.groupBy(col("wk").as("week"))
          .agg(
            sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
            sum(when(col("prev").isNotNull &&
              datediff(col("wk"), col("prev")) === 7, 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("prev").isNotNull &&
              datediff(col("wk"), col("prev")) > 7, 1L).otherwise(0L))
              .as("n_resurrected"))
        val chn = o
          .filter(col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7)
          .groupBy(date_add(col("wk"), 7).as("week"))
          .agg(count(lit(1)).as("n_churned"))
        act.join(chn, Seq("week"), "full_outer")
          .select(col("week"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .withColumn("net_growth",
            expr("n_new + n_resurrected - n_churned"))
          .orderBy(col("week"))
      },
      Some("""WITH uw AS (
               SELECT DISTINCT user_id,
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS wk
               FROM events),
             o AS (
               SELECT user_id, wk,
                 lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
                 lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
               FROM uw),
             act AS (
               SELECT wk AS week,
                 CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new,
                 CAST(sum(CASE WHEN prev IS NOT NULL
                     AND date_diff('day', prev, wk) = 7
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                 CAST(sum(CASE WHEN prev IS NOT NULL
                     AND date_diff('day', prev, wk) > 7
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
               FROM o GROUP BY wk),
             chn AS (
               SELECT wk + 7 AS week, CAST(count(*) AS BIGINT) AS n_churned
               FROM o
               WHERE nxt IS NULL OR date_diff('day', wk, nxt) > 7
               GROUP BY 1)
             SELECT coalesce(a.week, c.week) AS week,
               coalesce(a.n_new, 0) AS n_new,
               coalesce(a.n_retained, 0) AS n_retained,
               coalesce(a.n_resurrected, 0) AS n_resurrected,
               coalesce(c.n_churned, 0) AS n_churned,
               coalesce(a.n_new, 0) + coalesce(a.n_resurrected, 0)
                 - coalesce(c.n_churned, 0) AS net_growth
             FROM act a FULL OUTER JOIN chn c ON a.week = c.week
             ORDER BY week""")),

    // ---- TOP SESSION JOURNEYS: q25's 30-minute-gap sessionization,
    //      each session rendered as its ordered event-type path (first
    //      8 events — the prefix that distinguishes journey SHAPES;
    //      longer sessions truncate, deliberately) and the 20 most
    //      common paths reported with exact share. The sequence-mining
    //      readout ("view>click>purchase beats view>view>view") that
    //      q199's first-order matrix cannot see — paths are whole
    //      journeys, transitions are memoryless steps. Scale: the
    //      sessionize + rank windows are the declared per-user sort
    //      (q199 shape); the rn ≤ 8 filter runs BEFORE collect_list, so
    //      per-session state is ≤ 8 structs by construction; the path
    //      domain is ≤ |types|⁸ (390k for 5 types) whatever the event
    //      volume, so the final count + top-20 (TakeOrdered, no global
    //      sort of data rows) stay bounded; the one-row session total
    //      crossJoins. ----
    "q208_session_paths" -> QueryDef(
      (s, dir) => {
        val paths = sessionPaths(Tables.load(s, dir, "events"))
          .transform(TransientCache.scopedDF)
        val ns = paths.agg(count(lit(1)).as("n_total"))
        paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .crossJoin(ns)
          .select(col("path"), col("n_sessions"),
            expr("n_sessions * 10000L div n_total").as("share_bp"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""WITH marked AS (
               SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
                 event_type,
                 CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                        IS NULL
                       OR epoch_us(CAST(ts AS TIMESTAMP))
                          - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                          > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id)),
             sessioned AS (
               SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
               FROM marked),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                 ORDER BY t, event_id) AS rn
               FROM sessioned),
             paths AS (
               SELECT user_id, session_id,
                 string_agg(event_type, '>' ORDER BY t, event_id) AS path
               FROM ranked WHERE rn <= 8
               GROUP BY user_id, session_id),
             ns AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM paths),
             agg AS (
               SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
               FROM paths GROUP BY path)
             SELECT path, n_sessions,
               n_sessions * 10000 // n_total AS share_bp
             FROM agg CROSS JOIN ns
             ORDER BY n_sessions DESC, path
             LIMIT 20""")),

    // ---- ROBUST DAILY-VALUE OUTLIERS (median / MAD): per event type,
    //      days whose value total deviates from the type's median by
    //      more than 3× the median absolute deviation — the robust
    //      complement to q202's trailing-mean COUNT spikes (a mean
    //      baseline is dragged by the very outliers it hunts; the
    //      median/MAD pair is not). Float discipline: day totals are
    //      the established round(sum, 2) grid read; medians come from
    //      [[Percentiles]]' exact interpolated path (≡ quantile_cont,
    //      the q203 correspondence) over 2dp values, so they live on
    //      the 4dp grid ((a+b)/2 of 2dp values) and round cleanly; the
    //      FLAG compares the raw unrounded doubles with the identical
    //      expression in both engines — never a rounded-vs-raw mix.
    //      Scale: one map-side (type, date) rollup (calendar-bounded
    //      frame), two runs of the distributed percentile machinery
    //      over \|types\| groups, broadcast joins back. ----
    "q210_value_outliers_mad" -> QueryDef(
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("event_date"))
          .agg(round(sum(col("value")), 2).as("day_value"))
          .transform(TransientCache.scopedDF)
        val med = graft.ops.Percentiles.exactPercentiles(s, daily,
          "event_type", "day_value", Seq("med_raw" -> 0.5))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("day_value") - col("med_raw")))
          .transform(TransientCache.scopedDF)
        val mad = graft.ops.Percentiles.exactPercentiles(s, dev,
          "event_type", "adev", Seq("mad_raw" -> 0.5))
        dev.join(broadcast(mad), "event_type")
          .select(col("event_type"), col("event_date"), col("day_value"),
            round(col("med_raw"), 4).as("med_value"),
            round(col("mad_raw"), 4).as("mad_value"),
            when(col("adev") > col("mad_raw") * 3, 1L).otherwise(0L)
              .as("is_outlier"))
          .orderBy(col("event_type"), col("event_date"))
      },
      Some("""WITH d AS (
               SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                 round(sum(value), 2) AS day_value
               FROM events GROUP BY 1, 2),
             med AS (
               SELECT event_type, quantile_cont(day_value, 0.5) AS med_raw
               FROM d GROUP BY event_type),
             dev AS (
               SELECT d.*, m.med_raw,
                 abs(d.day_value - m.med_raw) AS adev
               FROM d JOIN med m USING (event_type)),
             mad AS (
               SELECT event_type, quantile_cont(adev, 0.5) AS mad_raw
               FROM dev GROUP BY event_type)
             SELECT v.event_type, v.event_date, v.day_value,
               round(v.med_raw, 4) AS med_value,
               round(a.mad_raw, 4) AS mad_value,
               CAST(CASE WHEN v.adev > a.mad_raw * 3 THEN 1 ELSE 0 END
                 AS BIGINT) AS is_outlier
             FROM dev v JOIN mad a USING (event_type)
             ORDER BY event_type, event_date""")),

    // ---- RFM SEGMENTATION: users bucketed into quartiles of Recency
    //      (days since last event), Frequency (event count) and
    //      Monetary (value total) — the classic CRM segmentation grid,
    //      reported as per-(r,f,m)-segment user counts and shares.
    //      Spelled SCALE-FIRST: quartile boundaries come from
    //      [[Percentiles]]' distributed exact path over the per-user
    //      frame (one constant-size threshold row per metric), and
    //      assignment is a map-side comparison 1+(v>p25)+(v>p50)+(v>p75)
    //      — NOT a global ntile window, which would total-sort every
    //      user through one ordering (and whose tie handling splits
    //      equal values arbitrarily; the threshold form gives equal
    //      values equal segments, deterministic in both engines).
    //      Scale: one user_id rollup, three percentile runs over the
    //      single-group frame, then one-row threshold crossJoins and a
    //      ≤4³-row rollup. ----
    "q211_rfm_segments" -> QueryDef(
      (s, dir) => {
        // persisted: the frame is consumed THREE times (both sides of
        // the corpus-max crossJoin and the n_total rollup) — without it
        // the events-table groupBy runs once per consumer (guide §2.4)
        val user = Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(max(col("ts")).as("last_ts"),
            count(lit(1)).as("frequency"),
            round(sum(col("value")), 2).as("monetary"))
          .transform(TransientCache.scopedDF)
        val ur = user.crossJoin(
            user.agg(max(col("last_ts")).as("corpus_max")))
          .withColumn("recency_days", datediff(
            col("corpus_max").cast("date"), col("last_ts").cast("date")))
          .transform(TransientCache.scopedDF)
        // ONE percentile run over the melted (metric, value) frame —
        // three metrics as three groups through a single distributed
        // sort — then the 3-row result pivots to a one-row threshold
        // frame (the three-separate-runs formulation measured 2.5 s vs
        // 1.5 s: each run pays its own range-partitioned sort)
        val melted = ur.selectExpr(
          """stack(3, 'r', cast(recency_days as double),
                      'f', cast(frequency as double),
                      'm', monetary) AS (metric, v)""")
        val cuts3 = graft.ops.Percentiles.exactPercentiles(s, melted,
          "metric", "v", Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
        val cutCols = for {
          m <- Seq("r", "f", "m")
          n <- Seq("25", "50", "75")
        } yield max(when(col("metric") === m, col(s"p$n"))).as(s"$m$n")
        val cutsRow = cuts3.agg(cutCols.head, cutCols.tail: _*)
        def seg(v: String, p: String) = expr(
          s"""cast(1 + if($v > ${p}25, 1, 0) + if($v > ${p}50, 1, 0)
              + if($v > ${p}75, 1, 0) as bigint)""")
        ur.crossJoin(cutsRow)
          .select(seg("recency_days", "r").as("r_seg"),
            seg("frequency", "f").as("f_seg"),
            seg("monetary", "m").as("m_seg"))
          .groupBy(col("r_seg"), col("f_seg"), col("m_seg"))
          .agg(count(lit(1)).as("n_users"))
          .crossJoin(user.agg(count(lit(1)).as("n_total")))
          .select(col("r_seg"), col("f_seg"), col("m_seg"), col("n_users"),
            expr("n_users * 10000L div n_total").as("share_bp"))
          .orderBy(col("r_seg"), col("f_seg"), col("m_seg"))
      },
      Some("""WITH u AS (
               SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts,
                 CAST(count(*) AS BIGINT) AS frequency,
                 round(sum(value), 2) AS monetary
               FROM events GROUP BY user_id),
             mx AS (SELECT max(last_ts) AS corpus_max FROM u),
             ur AS (
               SELECT u.*, date_diff('day', CAST(last_ts AS DATE),
                 CAST(corpus_max AS DATE)) AS recency_days
               FROM u CROSS JOIN mx),
             rp AS (SELECT quantile_cont(recency_days, 0.25) AS r25,
                      quantile_cont(recency_days, 0.5) AS r50,
                      quantile_cont(recency_days, 0.75) AS r75 FROM ur),
             fp AS (SELECT quantile_cont(frequency, 0.25) AS f25,
                      quantile_cont(frequency, 0.5) AS f50,
                      quantile_cont(frequency, 0.75) AS f75 FROM ur),
             mp AS (SELECT quantile_cont(monetary, 0.25) AS m25,
                      quantile_cont(monetary, 0.5) AS m50,
                      quantile_cont(monetary, 0.75) AS m75 FROM ur),
             seg AS (
               SELECT
                 CAST(1 + (CASE WHEN recency_days > r25 THEN 1 ELSE 0 END)
                   + (CASE WHEN recency_days > r50 THEN 1 ELSE 0 END)
                   + (CASE WHEN recency_days > r75 THEN 1 ELSE 0 END)
                   AS BIGINT) AS r_seg,
                 CAST(1 + (CASE WHEN frequency > f25 THEN 1 ELSE 0 END)
                   + (CASE WHEN frequency > f50 THEN 1 ELSE 0 END)
                   + (CASE WHEN frequency > f75 THEN 1 ELSE 0 END)
                   AS BIGINT) AS f_seg,
                 CAST(1 + (CASE WHEN monetary > m25 THEN 1 ELSE 0 END)
                   + (CASE WHEN monetary > m50 THEN 1 ELSE 0 END)
                   + (CASE WHEN monetary > m75 THEN 1 ELSE 0 END)
                   AS BIGINT) AS m_seg
               FROM ur CROSS JOIN rp CROSS JOIN fp CROSS JOIN mp),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM u)
             SELECT r_seg, f_seg, m_seg,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) * 10000 // n_total AS share_bp
             FROM seg CROSS JOIN tot
             GROUP BY r_seg, f_seg, m_seg, n_total
             ORDER BY r_seg, f_seg, m_seg""")),

    // ---- ACTIVITY CONCENTRATION: how much of the event volume the
    //      heaviest users carry — the power-user readout behind both
    //      capacity planning and the q67/q200 skew decisions (a stream
    //      whose top 1% of users carry half the rows salts its joins;
    //      one whose volume is flat does not). Tiers are percentile
    //      CUTS (the q211 discipline: distributed exact percentiles +
    //      map-side comparison, no global user sort), reported as
    //      exact int64 user/event shares per tier. The tier assembly
    //      runs on ONE aggregated row stacked to three tiers (the q86
    //      unpivot-on-one-row shape). ----
    "q214_user_concentration" -> QueryDef(
      (s, dir) => {
        val user = Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_ev"))
          .withColumn("g", lit(1))
          .transform(TransientCache.scopedDF)
        val cuts = graft.ops.Percentiles.exactPercentiles(s,
          user.selectExpr("g", "cast(n_ev as double) as v"), "g", "v",
          Seq("p90" -> 0.90, "p99" -> 0.99)).drop("g")
        user.crossJoin(cuts)
          .agg(count(lit(1)).as("nu"), sum(col("n_ev")).as("ne"),
            sum(when(col("n_ev") > col("p90"), 1L).otherwise(0L)).as("u90"),
            sum(when(col("n_ev") > col("p90"), col("n_ev")).otherwise(0L))
              .as("e90"),
            sum(when(col("n_ev") > col("p99"), 1L).otherwise(0L)).as("u99"),
            sum(when(col("n_ev") > col("p99"), col("n_ev")).otherwise(0L))
              .as("e99"))
          .selectExpr(
            """stack(3,
                 'all',    nu,  ne,  10000L, 10000L,
                 'top10',  u90, e90, u90 * 10000L div nu,
                                     e90 * 10000L div ne,
                 'top1',   u99, e99, u99 * 10000L div nu,
                                     e99 * 10000L div ne)
               AS (tier, n_users, n_events, user_share_bp,
                   event_share_bp)""")
          .orderBy(col("tier"))
      },
      Some("""WITH u AS (
               SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
               FROM events GROUP BY user_id),
             c AS (SELECT quantile_cont(n_ev, 0.90) AS p90,
                     quantile_cont(n_ev, 0.99) AS p99 FROM u),
             a AS (
               SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(sum(n_ev) AS BIGINT) AS ne,
                 CAST(sum(CASE WHEN n_ev > p90 THEN 1 ELSE 0 END)
                   AS BIGINT) AS u90,
                 CAST(sum(CASE WHEN n_ev > p90 THEN n_ev ELSE 0 END)
                   AS BIGINT) AS e90,
                 CAST(sum(CASE WHEN n_ev > p99 THEN 1 ELSE 0 END)
                   AS BIGINT) AS u99,
                 CAST(sum(CASE WHEN n_ev > p99 THEN n_ev ELSE 0 END)
                   AS BIGINT) AS e99
               FROM u CROSS JOIN c)
             SELECT * FROM (
               SELECT 'all' AS tier, nu AS n_users, ne AS n_events,
                 CAST(10000 AS BIGINT) AS user_share_bp,
                 CAST(10000 AS BIGINT) AS event_share_bp FROM a
               UNION ALL
               SELECT 'top10', u90, e90, u90 * 10000 // nu,
                 e90 * 10000 // ne FROM a
               UNION ALL
               SELECT 'top1', u99, e99, u99 * 10000 // nu,
                 e99 * 10000 // ne FROM a)
             ORDER BY tier""")),

    // ---- SESSION-DEPTH HISTOGRAM: q25's 30-minute-gap sessions rolled
    //      into power-of-two depth buckets (the q126/q200 histogram
    //      discipline on the session axis) with each bucket's share of
    //      sessions AND of event volume — the one-glance shape read
    //      (bounce-heavy vs marathon-heavy) that q208's top paths and
    //      q25's per-session rows don't aggregate. Scale: the
    //      sessionize window is the declared per-user sort; the
    //      histogram is a map-side rollup to ≤ 22 rows, and the share
    //      windows run on that constant-size frame. ----
    "q217_session_depth_histogram" -> QueryDef(
      (s, dir) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000 * 1000
        val bucketCase = "CASE " + (0 to 20).map(1L << _)
          .map(b => s"WHEN c < ${b * 2}L THEN CAST(${b}L AS BIGINT)")
          .mkString(" ") + s" ELSE CAST(${1L << 21}L AS BIGINT) END"
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev_us",
            lag(unix_micros(col("ts")), 1).over(byTime))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_sess"))
            .over(byTime.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("c"))
          .withColumn("bucket_lo", expr(bucketCase))
          .groupBy(col("bucket_lo"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("c")).as("n_events"))
          .select(col("bucket_lo"), col("n_sessions"), col("n_events"),
            expr("n_sessions * 10000L div sum(n_sessions) OVER ()")
              .as("sessions_bp"),
            expr("n_events * 10000L div sum(n_events) OVER ()")
              .as("events_bp"))
          .orderBy(col("bucket_lo"))
      },
      Some {
        val kase = "CASE " + (0 to 20).map(1L << _)
          .map(b => s"WHEN c < ${b * 2} THEN CAST($b AS BIGINT)")
          .mkString(" ") + s" ELSE CAST(${1L << 21} AS BIGINT) END"
        s"""WITH marked AS (
             SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
               CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                      IS NULL
                     OR epoch_us(CAST(ts AS TIMESTAMP))
                        - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
             FROM events
             WINDOW w AS (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id)),
           sessioned AS (
             SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
             FROM marked),
           sc AS (
             SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS c
             FROM sessioned GROUP BY user_id, session_id),
           h AS (
             SELECT $kase AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(c) AS BIGINT) AS n_events
             FROM sc GROUP BY 1)
           SELECT bucket_lo, n_sessions, n_events,
             n_sessions * 10000
               // CAST(sum(n_sessions) OVER () AS BIGINT) AS sessions_bp,
             n_events * 10000
               // CAST(sum(n_events) OVER () AS BIGINT) AS events_bp
           FROM h ORDER BY bucket_lo"""
      }),

    // ---- EVENT-MIX DRIFT: week-over-week L1 shift of the event-type
    //      share vector, with the top-moving type — the q162/q168
    //      drift-alarm discipline on the EVENT axis (an instrumentation
    //      change, a bot flood or a product launch shows up as a mix
    //      shift before any per-metric threshold fires). Shares live on
    //      a DENSE week×type grid (a type absent one week reads 0 bp,
    //      not a skipped lag row); the grid is |weeks|·|types| — weeks
    //      are calendar-bounded and the types frame is ≤|types| rows by
    //      construction, so its crossJoin build side is O(1). Top mover
    //      = rank-1 of (gap DESC, type) — deterministic ties in both
    //      engines, never max_by (tie order undefined). Pure int64. ----
    "q222_event_mix_drift" -> QueryDef(
      (s, dir) => {
        val counts = Tables.load(s, dir, "events")
          .groupBy(date_trunc("week", col("ts")).cast("date").as("wk"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .transform(TransientCache.scopedDF)
        val grid = counts.select(col("wk")).distinct()
          .crossJoin(broadcast(counts.select(col("event_type")).distinct()))
        val byType = Window.partitionBy(col("event_type")).orderBy(col("wk"))
        val gaps = grid.join(counts, Seq("wk", "event_type"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
          .withColumn("bp", expr(
            "n * 10000L div sum(n) OVER (PARTITION BY wk)"))
          .withColumn("prev_bp", lag(col("bp"), 1).over(byType))
          .filter(col("prev_bp").isNotNull)
          .withColumn("gap", abs(col("bp") - col("prev_bp")))
          .transform(TransientCache.scopedDF)
        val topw = Window.partitionBy(col("wk"))
          .orderBy(col("gap").desc, col("event_type"))
        gaps.withColumn("rk", row_number().over(topw))
          .withColumn("l1_bp", sum(col("gap"))
            .over(Window.partitionBy(col("wk"))))
          .filter(col("rk") === 1)
          .select(col("wk").as("week"), col("l1_bp"),
            col("event_type").as("top_mover"),
            col("gap").as("top_mover_gap_bp"))
          .orderBy(col("week"))
      },
      Some("""WITH counts AS (
               SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                 AS DATE) AS wk, event_type, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
             grid AS (
               SELECT w.wk, t.event_type
               FROM (SELECT DISTINCT wk FROM counts) w
               CROSS JOIN (SELECT DISTINCT event_type FROM counts) t),
             shares AS (
               SELECT g.wk, g.event_type,
                 coalesce(c.n, 0) * 10000
                   // CAST(sum(coalesce(c.n, 0)) OVER (PARTITION BY g.wk)
                        AS BIGINT) AS bp
               FROM grid g LEFT JOIN counts c
                 ON g.wk = c.wk AND g.event_type = c.event_type),
             gaps AS (
               SELECT wk, event_type, bp,
                 abs(bp - lag(bp) OVER (PARTITION BY event_type
                   ORDER BY wk)) AS gap
               FROM shares
               QUALIFY lag(bp) OVER (PARTITION BY event_type ORDER BY wk)
                 IS NOT NULL),
             ranked AS (
               SELECT wk, event_type, gap,
                 CAST(sum(gap) OVER (PARTITION BY wk) AS BIGINT) AS l1_bp,
                 row_number() OVER (PARTITION BY wk
                   ORDER BY gap DESC, event_type) AS rk
               FROM gaps)
             SELECT wk AS week, l1_bp, event_type AS top_mover,
               gap AS top_mover_gap_bp
             FROM ranked WHERE rk = 1
             ORDER BY week""")),

    // ---- SESSION-GAP SENSITIVITY SWEEP: before q25/q208/the q208
    //      streaming mirror hard-code the 30-minute session gap, this
    //      measures what each candidate gap would do — per gap g in
    //      {5m, 15m, 30m, 1h, 2h}: the session count (every user's
    //      first event opens one + every inter-event gap > g opens
    //      one) and mean events/session in centi-events. The same
    //      authoring-time-measurement discipline as q139's threshold
    //      sweep and q193's bloom sizing: the constant the pipeline
    //      ships is justified by a query, not a guess. A flat
    //      n_sessions curve around the shipped gap = robust choice; a
    //      steep one = session analytics are artifacts of the constant.
    //      Scale: ONE lag window per user (the q25 ordering) + one
    //      one-row conditional aggregate; the grid costs |grid|
    //      conditional sums in the SAME map-side pass (no per-gap
    //      rescan, no crossJoin — stack() unpivots the one-row frame).
    //      Both engines spell the grid from [[SessionGapSweepSeconds]]
    //      via one generator each, so Spark and oracle can never
    //      disagree on the grid. ----
    "q223_session_gap_sweep" -> QueryDef(
      (s, dir) => {
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap_us", unix_micros(col("ts"))
            - lag(unix_micros(col("ts")), 1).over(byTime))
        val aggCols =
          count(lit(1)).as("n_events") +:
          sum(when(col("gap_us").isNull, 1L).otherwise(0L)).as("n_users") +:
          SessionGapSweepSeconds.map(g =>
            sum(when(col("gap_us") > g * 1000000L, 1L).otherwise(0L))
              .as(s"b_$g"))
        val one = gaps.agg(aggCols.head, aggCols.tail: _*)
        val stackExpr = s"stack(${SessionGapSweepSeconds.size}, " +
          SessionGapSweepSeconds.map(g =>
            s"${g / 60}L, n_users + b_$g").mkString(", ") +
          ") AS (gap_minutes, n_sessions)"
        one.selectExpr(stackExpr, "n_events")
          .select(col("gap_minutes"), col("n_sessions"),
            expr("n_events * 100 div n_sessions")
              .as("events_per_session_x100"))
          .orderBy(col("gap_minutes"))
      },
      Some(s"""WITH g AS (
               SELECT epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
               FROM events),
             t AS (
               SELECT CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN gap_us IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_users,
                 ${SessionGapSweepSeconds.map(g =>
                   s"""CAST(sum(CASE WHEN gap_us > CAST(${g * 1000000L}
                      AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS b_$g""")
                   .mkString(",\n                 ")}
               FROM g)
             SELECT gap_minutes, n_sessions,
               n_events * 100 // n_sessions AS events_per_session_x100
             FROM (
               ${SessionGapSweepSeconds.map(g =>
                 s"""SELECT CAST(${g / 60} AS BIGINT) AS gap_minutes,
                    n_users + b_$g AS n_sessions, n_events FROM t""")
                 .mkString("\n               UNION ALL\n               ")}
             )
             ORDER BY gap_minutes""")),
  )
}
