package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming LOCF gap fill (round-13 verdict item #7): the online half of
  * the batch w8/w20 densification. Split-equality against the batch
  * gapFill on the replayed fixture, plus the three semantics the hand
  * grid pins: retro NULL-prefix emission for a type discovered mid-grid,
  * all-NULL buckets observing the hour but carrying the previous value,
  * and redelivered hours as no-ops.
  */
class StreamGapFillSpec extends SparkSuite {

  /** The settled hourly relation the operator consumes, derived from the
    * SAME aggregation the batch twin runs (hour truncation, latest value
    * by (ts, event_id)).
    */
  private def hourlyCounts(events: org.apache.spark.sql.DataFrame): Seq[TypedHourCount] =
    events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('HOUR', ts)) div 3600").as("hour_num"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("lv"))
      .collect()
      .map(r => TypedHourCount(r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_.hour_num)

  test("fixture replay across micro-batch splits equals the batch gapFill " +
      "row for row") {
    import spark.implicits._
    val events = graft.Catalog.events(spark, sfDir)
    val counts = hourlyCounts(events)
    assert(counts.nonEmpty)
    val mem = MemoryStream[TypedHourCount](spark)
    val q = StreamingGapFill.fill(mem.toDS()).writeStream
      .format("memory").queryName("gapfill_fixture").outputMode("append")
      .start()
    try {
      // three chunks split at bucket boundaries (settled-in-order is the
      // upstream watermark contract); chunk 2 is re-sent once — the
      // at-least-once redelivery the frontier must absorb
      val buckets = counts.map(_.hour_num).distinct.sorted
      val cut1 = buckets(buckets.size / 3)
      val cut2 = buckets(2 * buckets.size / 3)
      val c1 = counts.filter(_.hour_num <= cut1)
      val c2 = counts.filter(h => h.hour_num > cut1 && h.hour_num <= cut2)
      val c3 = counts.filter(_.hour_num > cut2)
      mem.addData(c1: _*); q.processAllAvailable()
      mem.addData(c2: _*); q.processAllAvailable()
      mem.addData(c2: _*); q.processAllAvailable() // redelivery no-op
      mem.addData(c3: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gapfill_fixture").as[GapFillRow].collect()
      .map(r => (r.event_type, r.hour_num, r.n_events, r.value_filled))
      .toSeq
    assert(streamed.size === streamed.distinct.size,
      "a (type, hour) row was emitted twice — redelivery leaked")
    val batch = graft.operators.Monitoring.gapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(streamed.toSet === batch.toSet,
      s"streamed ${streamed.size} rows != batch ${batch.size} rows; " +
        s"missing=${(batch.toSet -- streamed.toSet).take(3)} " +
        s"extra=${(streamed.toSet -- batch.toSet).take(3)}")
  }

  test("hand grid: mid-grid type discovery retro-emits its NULL prefix, " +
      "all-NULL buckets carry, silent GLOBAL hours still emit") {
    import spark.implicits._
    val mem = MemoryStream[TypedHourCount](spark)
    val q = StreamingGapFill.fill(mem.toDS()).writeStream
      .format("memory").queryName("gapfill_hand").outputMode("append")
      .start()
    try {
      mem.addData(
        TypedHourCount("a", 10L, 1L, Some(1.0)),
        TypedHourCount("a", 11L, 2L, Some(2.0)))
      q.processAllAvailable()
      // b first appears at hour 12 (retro NULL prefix over 10..11);
      // hour 13 is globally silent; a's hour 14 readings are all NULL
      // (n_events > 0, value carried from hour 11)
      mem.addData(
        TypedHourCount("b", 12L, 1L, Some(5.0)),
        TypedHourCount("a", 14L, 2L, None))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gapfill_hand").as[GapFillRow].collect()
      .map(r => (r.event_type, r.hour_num) -> ((r.n_events, r.value_filled)))
      .toMap
    val expected = Map(
      ("a", 10L) -> ((1L, Some(1.0))),
      ("a", 11L) -> ((2L, Some(2.0))),
      ("b", 10L) -> ((0L, None)), // retro NULL prefix
      ("b", 11L) -> ((0L, None)),
      ("a", 12L) -> ((0L, Some(2.0))), // a silent, carried
      ("b", 12L) -> ((1L, Some(5.0))),
      ("a", 13L) -> ((0L, Some(2.0))), // globally silent hour still emits
      ("b", 13L) -> ((0L, Some(5.0))),
      ("a", 14L) -> ((2L, Some(2.0))), // all-NULL bucket observes + carries
      ("b", 14L) -> ((0L, Some(5.0))))
    assert(got === expected, s"got $got")
  }
}
