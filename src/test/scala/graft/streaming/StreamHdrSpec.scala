package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** p14's online half: the log2-bucket histogram maintained in streaming
  * state must equal the batch histogram over the same rows under any
  * micro-batch split (counter addition is a monoid), and the shared
  * bucket kernel guarantees the two can never bin differently.
  */
case class HdrEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamHdrSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed histogram equals the batch counts across splits") {
    import spark.implicits._
    // micro values spread across buckets, two types, plus a negative
    // (filtered) and a zero (bucket 1)
    val rows = (1 to 30).map(i => HdrEv(i.toLong, ts("2024-01-01 10:00:00"),
      1L, if (i % 2 == 0) "a" else "b", i.toDouble / 1000000.0)) ++
      Seq(HdrEv(31, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
        HdrEv(32, ts("2024-01-01 10:00:00"), 1L, "a", -3.0))
    val mem = MemoryStream[HdrEv](spark)
    val q = Streams.streamingHdrHistogram(mem.toDF()).writeStream
      .format("memory").queryName("hdr_test").outputMode("complete").start()
    try {
      val (x, y) = rows.splitAt(11)
      mem.addData(x: _*)
      q.processAllAvailable()
      mem.addData(y: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hdr_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = rows.toDF()
      .filter(col("value") >= 0)
      .select(col("event_type"),
        graft.operators.Relational.hdrBucket(col("value")).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // the negative row is filtered: total mass is 31, not 32
    assert(streamed.toSeq.map(_._3).sum == 31L)
  }
}
