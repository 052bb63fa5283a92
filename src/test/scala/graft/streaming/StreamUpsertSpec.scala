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

  test("upsert sink under load: duplicate-key micro-batches hold the 1 s budget and per-key exactly-once") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-supsert-load").toString
    val table = s"$tmp/serving"
    // seed with batch 1's shape so every later batch is all-duplicate work
    Seq(Ev(0, ts("2024-01-01 00:00:00"), 0, "click", 1.0, null))
      .toDF().write.parquet(table)

    val mem = MemoryStream[Ev](spark)
    val q = Streams.upsertSink(mem.toDF(), table, Seq("event_id"),
      s"$tmp/ckpt").start()
    val Batches = 8
    try {
      (1 to Batches).foreach { b =>
        // 200 rows over 100 keys: every key duplicated IN the batch, and
        // the whole key range re-delivered EVERY batch — the worst-case
        // replay shape the sink's anti-join must absorb each trigger
        mem.addData((0 until 200).map { i =>
          Ev((i % 100).toLong, ts("2024-01-01 00:00:00"), i.toLong,
            "click", b.toDouble, null)
        }: _*)
        q.processAllAvailable()
      }
      // per-key exactly-once in the TABLE despite 16× re-delivery per key
      val served = spark.read.parquet(table)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n"),
          min(col("value")).as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(served.keySet == (0L until 100L).toSet)
      assert(served.values.forall(_._1 == 1L),
        s"a replayed key re-appended: ${served.filter(_._2._1 > 1L)}")
      // first delivery wins everywhere (key 0 from the seed, the rest
      // from batch 1) — DO NOTHING semantics under load
      assert(served.values.forall(_._2 == 1.0))
      // end-to-end latency: the measured per-trigger execution time must
      // hold the sink's 1 s budget. Median over the loaded batches — one
      // GC/box-noise outlier must not flake the suite (Bench's median
      // discipline), but a sink that CAN'T keep up fails every batch.
      val durs = q.recentProgress.toSeq
        .filter(p => p.numInputRows > 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      assert(durs.size >= Batches / 2, s"too few measured triggers: $durs")
      val median = durs.sorted.apply(durs.size / 2)
      assert(median < 1000L,
        s"median micro-batch ${median} ms breaches the 1 s trigger budget ($durs)")
    } finally q.stop()
  }
}
