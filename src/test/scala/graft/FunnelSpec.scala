package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q198's GREEDY strictly-after funnel semantics on planted
  * journeys — the oracle SQL replays whatever semantics the query
  * spells, so a semantics bug would be mirrored in both engines and
  * invisible to the hash gate. The fixture covers the cases that
  * distinguish a greedy funnel from a naive per-type min:
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
}
