package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture semantics pins for the event-analytics queries
  * (q198 funnel, q199 transitions, q200 skew audit, q201 attribution,
  * q202 spikes) — the oracle SQL replays whatever semantics each query
  * spells, so a semantics bug would be mirrored in both engines and
  * invisible to the hash gate; these fixtures pin the INTENT.
  * The q198 journeys cover the cases that distinguish a greedy funnel
  * from a naive per-type min:
  *
  *   - A: clean view → click → purchase (all three stages);
  *   - B: a click BEFORE the first view (no click strictly after the
  *     view ⇒ stage 1 only — a naive min-per-type would count it);
  *   - C: a purchase before the first qualifying click ⇒ stage 2 only;
  *   - D: view only ⇒ stage 1;
  *   - E: purchase@+5s, click@+10s, purchase@+20s — the stage-3 min
  *     must be the +20s purchase (strictly after the +10s click), NOT
  *     the user's global min purchase.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def at(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("q198: greedy strictly-after staging on out-of-order journeys") {
    import spark.implicits._
    val rows = Seq(
      // (user, type, t-offset seconds)
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 30),
      (2L, "click", -5), (2L, "view", 0),
      (3L, "purchase", 5), (3L, "view", 0), (3L, "click", 20),
      (4L, "view", 0),
      (5L, "view", 0), (5L, "purchase", 5), (5L, "click", 10),
      (5L, "purchase", 20))
    val dir = TestDirs.scratch("funnel")
    rows.zipWithIndex.map { case ((u, t, off), i) =>
      (i.toLong, at(off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q198_funnel")(spark, dir)
      .orderBy(col("stage"))
      .select("stage", "n_users", "conv_prev_bp", "conv_s1_bp",
        "avg_us_from_prev")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

    // stage 1: A,B,C,D,E viewed. stage 2: A (+10s), C (+20s), E (+10s).
    // stage 3: A (30-10=20s), E (20-10=10s).
    assert(out == Seq(
      (1, 5L, 10000L, 10000L, 0L),
      (2, 3L, 6000L, 6000L, (10L + 20L + 10L) * 1000000L / 3L),
      (3, 2L, 6666L, 4000L, 15000000L)))
  }

  test("q201: LAST touch wins, purchases are transparent, untouched purchases land in 'none'") {
    import spark.implicits._
    val rows = Seq(
      // u1: the click (latest touch) gets the credit, not the view
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 20),
      // u2: purchase with no prior touch → 'none'
      (2L, "purchase", 0),
      // u3: BOTH purchases credit the view — the first purchase does
      // not reset attribution for the second
      (3L, "view", 0), (3L, "purchase", 10), (3L, "purchase", 20))
    val dir = TestDirs.scratch("attrib")
    rows.zipWithIndex.map { case ((u, t, off), i) =>
      (i.toLong, at(off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q201_last_touch_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("click", 1L, 2500L, 10000000L),
      ("none", 1L, 2500L, 0L),
      ("view", 2L, 5000L, 15000000L)))
  }

  test("q202: a planted 2.5x day flags; baseline days and short-history days do not") {
    import spark.implicits._
    // 10 observed days: days 1-8 at 10 errors, day 9 at 25 (the spike),
    // day 10 back at 10 — but day 10's trailing window now CONTAINS the
    // spike (mean (7*10+25) div 7 = 13), so its ratio dips below 10000
    // without flagging. Days 1-7 are withheld (no full 7-day history).
    val perDay = Map(9 -> 25).withDefaultValue(10)
    val rows = for {
      day <- 1 to 10
      i <- 0 until perDay(day)
    } yield (day.toLong * 1000 + i,
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:00"),
      1L, "error", 1.0, "{}")
    val dir = TestDirs.scratch("spikes")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q202_error_spikes")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("2024-03-08", 10L, 10L, 10000L, 0L),
      ("2024-03-09", 25L, 10L, 25000L, 1L),
      ("2024-03-10", 10L, 12L, 8333L, 0L)))
  }

  test("q199: equal timestamps order by event_id; transitions count per consecutive pair") {
    import spark.implicits._
    // user 1: view→click→purchase with the MIDDLE pair at an identical
    // timestamp — (ts, event_id) tie-break decides which transition
    // exists, so a nondeterministic order would flip the matrix
    val rows = Seq(
      (10L, at(0), 1L, "view", 1.0, "{}"),
      (11L, at(5), 1L, "click", 1.0, "{}"),
      (12L, at(5), 1L, "purchase", 1.0, "{}"),
      (20L, at(0), 2L, "view", 1.0, "{}"))
    val dir = TestDirs.scratch("transitions")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q199_event_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // id 11 (click) precedes id 12 (purchase) at the tied instant:
    // view→click and click→purchase, never view→purchase
    assert(out == Seq(
      ("click", "purchase", 1L, 10000L),
      ("view", "click", 1L, 10000L)))
  }

  test("q200: planted key distributions land in their power-of-two buckets with exact shares") {
    import spark.implicits._
    val dir = TestDirs.scratch("skew")
    // events.user_id: sizes 1,1,2,3,8 → buckets 1 (2 keys/2 rows),
    // 2 (2 keys/5 rows), 8 (1 key/8 rows); 5 keys / 15 rows total
    val ev = for {
      (u, n) <- Seq((1L, 1), (2L, 1), (3L, 2), (4L, 3), (5L, 8))
      i <- 0 until n
    } yield (u * 100 + i, at(i), u, "view", 1.0, "{}")
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // one uniform key each for the other two audits
    Seq.fill(4)(7L).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq.fill(2)(9L).toDF("o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = SparkEntry.queries("q200_key_skew_audit")(spark, dir)
      .filter(col("audit") === "events.user_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 4000L, 1333L),
      (2L, 2L, 5L, 4000L, 3333L),
      (8L, 1L, 8L, 2000L, 5333L)))
  }

  test("q206: repeat events collapse into one basket; lift runs the staged int64 formula") {
    import spark.implicits._
    val rows = Seq(
      // u1 day1: TWO views + a click — the distinct collapses to one
      // {view, click} basket, so n_view counts this basket once
      (1L, "view", 0), (1L, "view", 60), (1L, "click", 120),
      // u1 day2: view only (singleton basket contributes no pair)
      (1L, "view", 86400),
      // u2 day1: view + error
      (2L, "view", 0), (2L, "error", 30),
      // u3 day1: click only
      (3L, "click", 0))
    val dir = TestDirs.scratch("lift")
    rows.zipWithIndex.map { case ((u, t, off), i) =>
      (i.toLong, at(off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q206_event_type_lift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // NB=4 baskets; n_view=3, n_click=2, n_error=1
    // (click,view): support 1*1e4/4=2500, lift ((1e4 div 2)*4) div 3 = 6666
    // (error,view): support 2500, lift ((1e4 div 1)*4) div 3 = 13333
    assert(out == Seq(
      ("click", "view", 1L, 2500L, 6666L),
      ("error", "view", 1L, 2500L, 13333L)))
  }

  test("q207: new/retained/resurrected/churned decompose the weekly actives; net equals delta-active") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    // Mondays: w1=03-04, w2=03-11, w3=03-18, w4=03-25 (2024)
    val rows = Seq(
      // u1: w1 (twice — collapses), w2, w3 → new, retained, retained
      (1L, "2024-03-04"), (1L, "2024-03-05"), (1L, "2024-03-11"),
      (1L, "2024-03-18"),
      // u2: w1, w3 → new; churn into w2; resurrected at w3
      (2L, "2024-03-06"), (2L, "2024-03-20"),
      // u3: w2 only → new at w2; churn into w3
      (3L, "2024-03-13"))
    val dir = TestDirs.scratch("growth")
    rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, ts(d), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q207_growth_accounting")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("2024-03-04", 2L, 0L, 0L, 0L, 2L),
      ("2024-03-11", 1L, 1L, 0L, 1L, 0L),
      ("2024-03-18", 0L, 1L, 1L, 1L, 0L),
      // the week PAST the data: everyone still active at w3 churns
      ("2024-03-25", 0L, 0L, 0L, 2L, -2L)))
    // growth-ledger identity: net(w) = active(w) − active(w−1)
    val actives = Map("2024-03-04" -> 2L, "2024-03-11" -> 2L,
      "2024-03-18" -> 2L, "2024-03-25" -> 0L)
    val weeks = out.map(_._1)
    weeks.zip("" +: weeks).foreach { case (w, pw) =>
      assert(out.find(_._1 == w).get._6 ==
        actives(w) - actives.getOrElse(pw, 0L), s"identity at $w")
    }
  }

  test("q208: gaps split sessions, long sessions truncate at 8, top-20 tie-breaks on path") {
    import spark.implicits._
    val rows = Seq(
      // u1 session 1: the full journey; session 2 (2h later): lone view
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 20),
      (1L, "view", 7200),
      // u2: lone view
      (2L, "view", 0),
      // u3: 9 views 1s apart — the path truncates to the first 8
      ) ++ (0 until 9).map(i => (3L, "view", 100 + i))
    val dir = TestDirs.scratch("paths")
    rows.zipWithIndex.map { case ((u, t, off), i) =>
      (i.toLong, at(off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q208_session_paths")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val eightViews = Seq.fill(8)("view").mkString(">")
    // 4 sessions total; ties at n=1 order by path ('c' < 'v')
    assert(out == Seq(
      ("view", 2L, 5000L),
      ("view>click>purchase", 1L, 2500L),
      (eightViews, 1L, 2500L)))
  }

  test("q210: a planted 10x day flags; a symmetric-spread type flags nothing; MAD 0 only flags real deviation") {
    import spark.implicits._
    // 'error': 10.0 on 7 days + one 100.0 day → median 10, MAD 0 —
    // only the 100.0 day deviates (adev 90 > 0); the exact-10 days have
    // adev exactly 0, NOT > 0. 'view': 10/20/30 → med 20, MAD 10,
    // threshold 30 → nothing flags.
    val rows =
      (1 to 7).map(d => ("error", d, 10.0)) ++ Seq(("error", 8, 100.0)) ++
        Seq(("view", 1, 10.0), ("view", 2, 20.0), ("view", 3, 30.0))
    val dir = TestDirs.scratch("mad")
    rows.zipWithIndex.map { case ((t, day, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:00"),
        1L, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q210_value_outliers_mad")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getLong(5))).toSeq
    assert(out.filter(_._4 == 1L) ==
      Seq(("error", "2024-03-08", 100.0, 1L)))
    assert(out.count(_._1 == "view") == 3 &&
      out.filter(_._1 == "view").forall(_._4 == 0L))
  }

  test("q211: planted diagonal users land on the segment diagonal with exact shares") {
    import spark.implicits._
    // u_k (k=1..4): k events of value 10 with the last k-1 days back →
    // recency {3,2,1,0}... u1 last day-0? Build: u_k's events all on
    // day (10 - (k-1)) → recency_days = k-1; frequency k; monetary 10k.
    // Quartile thresholds of {0..3}/{1..4}/{10..40} interpolate strictly
    // inside the gaps, so segments are the clean diagonal.
    val rows = for {
      k <- 1 to 4
      i <- 0 until k
    } yield (k.toLong,
      java.sql.Timestamp.valueOf(f"2024-03-${10 - (k - 1)}%02d 0$i:00:00"),
      10.0)
    val dir = TestDirs.scratch("rfm")
    rows.zipWithIndex.map { case ((u, t, v), i) =>
      (i.toLong, t, u, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q211_rfm_segments")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // u1: 1 event, most RECENT? no — u1 is on day 10, u4 on day 7:
    // u1 recency 0 → r_seg 1, freq 1 → f_seg 1, monetary 10 → m_seg 1;
    // u4 recency 3, freq 4, monetary 40 → (4,4,4)
    assert(out == Seq(
      (1L, 1L, 1L, 1L, 2500L),
      (2L, 2L, 2L, 1L, 2500L),
      (3L, 3L, 3L, 1L, 2500L),
      (4L, 4L, 4L, 1L, 2500L)))
  }

  test("q214: one 91-event whale among nine singletons carries 91% of volume in both tiers") {
    import spark.implicits._
    // users 1..9 with one event each; user 10 with 91 → p90 cut 10.0,
    // p99 cut 82.9 (interpolated) — only the whale clears either
    val rows = (1 to 9).map(u => (u.toLong, 1)) :+ (10L, 91)
    val ev = rows.flatMap { case (u, n) =>
      (0 until n).map(i => (u * 1000 + i, at(i), u, "view", 1.0, "{}"))
    }
    val dir = TestDirs.scratch("conc")
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q214_user_concentration")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("all", 10L, 100L, 10000L, 10000L),
      ("top1", 1L, 91L, 1000L, 9100L),
      ("top10", 1L, 91L, 1000L, 9100L)))
  }

  test("q217: session depths land in power-of-two buckets with exact session and event shares") {
    import spark.implicits._
    // u1: 3 events inside 30 min (one depth-3 session), then a 2h gap
    // and 1 more (a depth-1 session); u2: 5 events (depth-5 session)
    val rows = Seq(
      (1L, 0), (1L, 60), (1L, 120), (1L, 7800),
      (2L, 0), (2L, 30), (2L, 60), (2L, 90), (2L, 120))
    val dir = TestDirs.scratch("depth")
    rows.zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, at(off), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q217_session_depth_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // 3 sessions / 9 events: depth 1 → bucket 1, depth 3 → bucket 2,
    // depth 5 → bucket 4
    assert(out == Seq(
      (1L, 1L, 1L, 3333L, 1111L),
      (2L, 1L, 3L, 3333L, 3333L),
      (4L, 1L, 5L, 3333L, 5555L)))
  }

  test("q222: a mix flip shows the exact L1; absent types read 0 bp; ties break on type") {
    import spark.implicits._
    def ts(d: String, i: Int) =
      java.sql.Timestamp.valueOf(f"$d 0$i:00:00")
    // w1: all view; w2: 50/50 view/click (click was ABSENT in w1 — the
    // dense grid must read it as 0 bp, not skip the lag); w3 repeats w2
    val rows =
      (0 until 10).map(i => ("view", "2024-03-04", i)) ++
        (0 until 5).map(i => ("view", "2024-03-11", i)) ++
        (0 until 5).map(i => ("click", "2024-03-11", i)) ++
        (0 until 5).map(i => ("view", "2024-03-18", i)) ++
        (0 until 5).map(i => ("click", "2024-03-18", i))
    val dir = TestDirs.scratch("mixdrift")
    rows.zipWithIndex.map { case ((t, d, h), i) =>
      (i.toLong, ts(d, h), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q222_event_mix_drift")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      // view 10000→5000, click 0→5000: L1 = 10000; tie → 'click'
      ("2024-03-11", 10000L, "click", 5000L),
      ("2024-03-18", 0L, "click", 0L)))
  }
}
