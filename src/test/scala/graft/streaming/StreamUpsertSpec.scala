package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

case class UpsertEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming upsert sink: per-key exactly-once lands in the serving table
  * under foreachBatch's at-least-once delivery — new keys append, replayed
  * or duplicate keys are no-ops (within a batch, across batches, and
  * against the pre-seeded table), and the end state equals the batch
  * upsert of the same delta.
  */
class StreamUpsertSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private type Ev = UpsertEv
  private def Ev(id: Long, t: Timestamp, u: Long, et: String, v: Double,
      p: String): UpsertEv = UpsertEv(id, t, u, et, v, p)

  test("streaming upsert: new keys land once, replays and dups are no-ops") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-supsert").toString
    val table = s"$tmp/serving"
    // pre-seeded serving table with keys 1 and 2
    Seq(Ev(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0, null),
      Ev(2, ts("2024-01-01 00:01:00"), 1, "view", 2.0, null))
      .toDF().write.parquet(table)

    val mem = MemoryStream[Ev](spark)
    val q = Streams.upsertSink(mem.toDF(), table, Seq("event_id"),
      s"$tmp/ckpt").start()
    try {
      // batch 1: one already-present key (2: conflict, kept as-is), one
      // new key (3), one in-batch duplicate key (4 twice — first wins
      // after dropDuplicates; value may be either, count must be 1)
      mem.addData(
        Ev(2, ts("2024-01-01 00:05:00"), 9, "view", 99.0, null),
        Ev(3, ts("2024-01-01 00:06:00"), 2, "click", 3.0, null),
        Ev(4, ts("2024-01-01 00:07:00"), 2, "click", 4.0, null),
        Ev(4, ts("2024-01-01 00:08:00"), 2, "click", 4.5, null))
      q.processAllAvailable()
      // batch 2: replay of key 3 (re-delivery) + new key 5
      mem.addData(
        Ev(3, ts("2024-01-01 00:06:00"), 2, "click", 3.0, null),
        Ev(5, ts("2024-01-01 00:09:00"), 3, "error", 5.0, null))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(table)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"),
        min(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got.values.forall(_._1 == 1L), s"every key exactly once: $got")
    assert(got(1L)._2 == 1.0 && got(2L)._2 == 2.0,
      "conflicting keys keep the ORIGINAL row (DO NOTHING semantics)")
    assert(got(3L)._2 == 3.0 && got(5L)._2 == 5.0)
  }
}
