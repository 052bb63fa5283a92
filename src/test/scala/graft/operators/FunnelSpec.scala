package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** w9 ordered-funnel semantics on hand-built event sequences: the ordering
  * rules (each step strictly after the previous step's FIRST occurrence)
  * and the one-shuffle plan shape.
  */
class FunnelSpec extends SparkSuite {

  import spark.implicits._

  // build a parquet fixture dir shaped like the events table so the gate
  // query itself (Catalog.events read included) is what's under test
  private lazy val dir: String = {
    val d = Files.createTempDirectory("funnel").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      // user 1: full ordered conversion
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase"),
      // user 2: purchase BEFORE the click -> stops at step 2
      (4L, ts("2024-01-01 09:00:00"), 2L, "signup"),
      (5L, ts("2024-01-01 09:10:00"), 2L, "purchase"),
      (6L, ts("2024-01-01 09:20:00"), 2L, "click"),
      // user 3: click BEFORE signup -> stops at step 1
      (7L, ts("2024-01-01 08:00:00"), 3L, "click"),
      (8L, ts("2024-01-01 08:30:00"), 3L, "signup"),
      // user 4: no signup at all -> step 0
      (9L, ts("2024-01-01 07:00:00"), 4L, "click"),
      // user 5: click at the SAME ts as signup -> strictly-after fails
      (10L, ts("2024-01-01 06:00:00"), 5L, "signup"),
      (11L, ts("2024-01-01 06:00:00"), 5L, "click"),
      // user 6: second click (after signup) converts even though the
      // FIRST click preceded signup
      (12L, ts("2024-01-01 05:00:00"), 6L, "click"),
      (13L, ts("2024-01-01 05:30:00"), 6L, "signup"),
      (14L, ts("2024-01-01 05:45:00"), 6L, "click"),
      (15L, ts("2024-01-01 05:50:00"), 6L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    d
  }

  private lazy val byUser =
    Monitoring.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("ordered progression: each step strictly after the previous first") {
    assert(byUser(1L).getLong(4) == 3)
    assert(byUser(2L).getLong(4) == 2, "purchase before click must not count")
    assert(byUser(3L).getLong(4) == 1, "click before signup must not count")
    assert(byUser(4L).getLong(4) == 0, "no signup -> step 0")
    assert(byUser(5L).getLong(4) == 1, "same-ts click is not strictly after")
  }

  test("a later re-occurrence completes the funnel (first VALID, not first)") {
    val u6 = byUser(6L)
    assert(u6.getLong(4) == 3)
    assert(u6.getTimestamp(2).toString.startsWith("2024-01-01 05:45"),
      "click_ts must be the first click AFTER signup, not the earlier one")
  }

  test("the whole funnel plans ONE exchange (windows + agg share the key)") {
    val plan = Monitoring.funnel(spark, dir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single hash exchange, got $exchanges:\n$plan")
  }

  // --- w11 streaks ---------------------------------------------------------

  private def streakRows(rows: (Long, Long, Double)*) = {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    rows.map { case (u, id, v) =>
      (id, new java.sql.Timestamp(ts.getTime + id * 1000), u,
        if (v < 0) null.asInstanceOf[java.lang.Double] else Double.box(v))
    }.toDF("event_id", "ts", "user_id", "value")
  }

  test("w11 streaks: island lengths, NULL breaks runs, all-low users absent") {
    // user 1 ordered values: 90 90 10 90 NULL 90 90 90 -> runs 2, 1, 3
    val df = streakRows(
      (1L, 1L, 90), (1L, 2L, 90), (1L, 3L, 10), (1L, 4L, 90),
      (1L, 5L, -1 /* NULL */), (1L, 6L, 90), (1L, 7L, 90), (1L, 8L, 90),
      // user 2: never above threshold -> no output row
      (2L, 9L, 10), (2L, 10L, 20))
    val got = Monitoring.streaksOf(df, col("value") > 80.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((6L, 3L, 3L))), s"got $got")
  }

  test("w11 ts ties break by event_id; runs never span users") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // user 3: events 100 (high) and 101 (low) share a ts, then 102 high:
    // event_id order makes it high,low,high -> two runs of 1
    val df = Seq(
      (100L, base, 3L, Double.box(90.0)),
      (101L, base, 3L, Double.box(10.0)),
      (102L, new java.sql.Timestamp(base.getTime + 1000), 3L, Double.box(90.0)),
      // user 4 adjacent in id-space must not merge runs with user 3
      (103L, new java.sql.Timestamp(base.getTime + 2000), 4L, Double.box(90.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Monitoring.streaksOf(df, col("value") > 80.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(3L -> ((2L, 2L, 1L)), 4L -> ((1L, 1L, 1L))), s"got $got")
  }

  // --- w12 time-weighted average -------------------------------------------

  test("w12 twa weighs by holding time where naive AVG weighs by sample count") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val df = Seq(
      // type A: 10.0 held 90s, then 100.0 held 10s to the horizon
      // twa = (10*90 + 100*10)/100 = 19.0; naive = 55.0
      (1L, at(0), 1L, "A", Double.box(10.0)),
      (2L, at(90), 1L, "A", Double.box(100.0)),
      // type B: ts tie -> event 3 holds ZERO seconds, event 4 holds all
      // 100s; a NULL reading is excluded entirely
      (3L, at(0), 1L, "B", Double.box(999.0)),
      (4L, at(0), 1L, "B", Double.box(7.0)),
      (5L, at(50), 1L, "B", null.asInstanceOf[java.lang.Double]))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Monitoring.timeWeightedAvgOf(df, "2024-01-01 00:01:40")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("A") == ((2L, 100000000L, 19.0, 55.0)), s"got ${got("A")}")
    // B: naive mean counts the zero-duration sample (999+7)/2 = 503;
    // twa ignores it completely -> 7.0
    assert(got("B") == ((2L, 100000000L, 7.0, 503.0)), s"got ${got("B")}")
  }

  // --- w13 burn rate ---------------------------------------------------------

  test("w13 burst pages, steady elevation does not, and a series GAP resets the window") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def rows(hour: Int, total: Int, errors: Int) = (0 until total).map { i =>
      (hour * 1000L + i,
        new java.sql.Timestamp(base.getTime + hour * 3600000L + i * 1000L),
        1L, if (i < errors) "error" else "click", 1.0)
    }
    // hours 0-5 steady 10%; hour 6 bursts to 50%; hour 20 (after a GAP)
    // runs 30% in isolation
    val df = ((0 to 5).flatMap(h => rows(h, 100, 10)) ++
      rows(6, 100, 50) ++ rows(20, 100, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Monitoring.burnRateOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4), r.getBoolean(7))))
      .toMap
    val h0 = out.keys.min
    // steady hours never alert (short == long)
    (0 to 5).foreach(h =>
      assert(!out(h0 + h)._3, s"steady hour $h alerted"))
    // the burst hour alerts: 50*550 > 2*100*100
    assert(out(h0 + 6) == ((50L, 100L, true)), s"got ${out(h0 + 6)}")
    // the isolated post-gap hour must NOT alert: its RANGE window holds
    // only itself (short == long). A rows-frame implementation would drag
    // hours 1-6 in and fire spuriously — this is the regression pin.
    assert(out(h0 + 20) == ((30L, 30L, false)),
      s"gap hour: ${out(h0 + 20)} — rows-frame regression?")
  }

  test("w11 plans ONE hash exchange (windows + both aggregates share the key)") {
    val df = streakRows((1L, 1L, 90), (1L, 2L, 10))
    val plan = Monitoring.streaksOf(df, col("value") > 80.0)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single hash exchange, got $exchanges:\n$plan")
  }

  // --- w10 retention on a second hand-built fixture -----------------------

  private lazy val retDir: String = {
    val d = Files.createTempDirectory("retention").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      // user 1: signs up Mon Jan 1, active same week, week 2, and week 2
      // AGAIN (distinct-count must not double-count)
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup"),
      (2L, ts("2024-01-03 10:00:00"), 1L, "click"),
      (3L, ts("2024-01-16 10:00:00"), 1L, "view"),
      (4L, ts("2024-01-17 10:00:00"), 1L, "click"),
      // user 2: same cohort week (signs up Wed Jan 3); pre-signup click
      // on Jan 2 must NOT count (negative offset); active week 1
      (5L, ts("2024-01-02 09:00:00"), 2L, "click"),
      (6L, ts("2024-01-03 09:00:00"), 2L, "signup"),
      (7L, ts("2024-01-11 09:00:00"), 2L, "view"),
      // user 3: never signs up -> excluded entirely
      (8L, ts("2024-01-04 08:00:00"), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("a11 decay: hand-computed dyadic weights; over-cap events drop") {
    val d = Files.createTempDirectory("decay").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // as-of 2024-02-01 00:00: ages 0d, 1d, 2d, 2d -> 1 + 0.5 + 0.25 + 0.25
    Seq(
      (1L, ts("2024-01-31 12:00:00"), 1L, "click"),
      (2L, ts("2024-01-30 12:00:00"), 1L, "click"),
      (3L, ts("2024-01-29 12:00:00"), 2L, "click"),
      (4L, ts("2024-01-29 18:00:00"), 2L, "click"),
      // 80 days old: weight < 2^-40 -> dropped by the cap, not shifted
      (5L, ts("2023-11-13 00:00:00"), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    val r = Monitoring.decayedEngagement(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 4, "the over-cap event must not count")
    assert(r.head.getDouble(2) == 2.0, s"exact dyadic sum, got ${r.head.getDouble(2)}")
  }

  test("retention: cohorts by signup week, whole-week offsets, pre-signup excluded") {
    val rows = Monitoring.retention(spark, retDir).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    // both users cohort to the Jan-1 Monday week
    // offset 0: u1 (signup+click), u2 (signup) -> 2
    assert(rows(("2024-01-01", 0L)) == 2)
    // offset 1: u2's Jan-11 view (8d after Jan-3) AND u1's nothing -> 1
    assert(rows(("2024-01-01", 1L)) == 1)
    // offset 2: u1's Jan-16/17 events, distinct-counted once -> 1
    assert(rows(("2024-01-01", 2L)) == 1)
    // no other cells: u3 never signed up, u2's pre-signup click dropped
    assert(rows.size == 3)
  }
}
