package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** w19 OHLC semantics: hand-computed bars, the (ts, event_id) tie
  * discipline on open/close, and single-event degeneration.
  */
class OhlcSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, typ, v) => (id, ts(t), typ, v) }
      .toDF("event_id", "ts", "event_type", "value")
  }

  test("hand bars: open enters, close leaves, high/low envelope, count") {
    val df = ev(
      (1L, "2024-01-01 10:05:00", "m", 5.0),
      (2L, "2024-01-01 10:20:00", "m", 9.0),
      (3L, "2024-01-01 10:40:00", "m", 2.0),
      (4L, "2024-01-01 11:30:00", "m", 7.0))
    val got = Monitoring.ohlcBarsOf(df).collect()
      .map(r => r.getTimestamp(1).toString ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got("2024-01-01 10:00:00.0") == ((5.0, 9.0, 2.0, 2.0, 3L)))
    assert(got("2024-01-01 11:00:00.0") == ((7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("equal timestamps: event_id breaks the open/close tie") {
    val df = ev(
      (2L, "2024-01-01 10:00:00", "m", 8.0),
      (1L, "2024-01-01 10:00:00", "m", 3.0), // same ts, lower id → open
      (3L, "2024-01-01 10:00:00", "m", 6.0))
    val r = Monitoring.ohlcBarsOf(df).collect().head
    assert((r.getDouble(2), r.getDouble(5)) == ((3.0, 6.0)),
      s"tie-break violated: $r")
  }

  test("types bar independently") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a", 1.0),
      (2L, "2024-01-01 10:01:00", "b", 9.0))
    val got = Monitoring.ohlcBarsOf(df).collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b"))
  }
}
