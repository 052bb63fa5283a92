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
}
