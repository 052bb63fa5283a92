package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** c14's online half: the categorical value-count state maintained in
  * streaming must equal the batch counts over the same rows under any
  * micro-batch split (count addition is a monoid), and the factored
  * entropy tail over the snapshot must equal the batch c14 arm exactly —
  * so the live diversity profile and the gate profile can never diverge.
  */
case class EntEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamEntropySpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed counts + the factored tail equal the batch c14 arm across splits") {
    import spark.implicits._
    // skewed types incl. a NULL (counted under the NULL key, excluded
    // from the distribution by the tail — c12's rule)
    val types = Seq.fill(9)("view") ++ Seq.fill(4)("click") ++
      Seq.fill(2)("purchase") ++ Seq("signup") ++ Seq(null, null)
    val rows = types.zipWithIndex.map { case (t, i) =>
      EntEv(i.toLong, ts("2024-01-01 10:00:00"), 1L, t, 1.0)
    }
    val mem = MemoryStream[EntEv](spark)
    val q = Streams.streamingValueCounts(mem.toDF()).writeStream
      .format("memory").queryName("ent_test").outputMode("complete").start()
    try {
      val (x, rest) = rows.splitAt(5)
      val (y, z) = rest.splitAt(7)
      mem.addData(x: _*); q.processAllAvailable()
      mem.addData(y: _*); q.processAllAvailable()
      mem.addData(z: _*); q.processAllAvailable()
    } finally q.stop()
    val snapshot = spark.table("ent_test")
    // state equals the batch grouped counts
    val streamedCounts = snapshot.collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val batchCounts = rows.toDF().groupBy(col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(streamedCounts === batchCounts)
    // the factored tail over the snapshot equals the batch c14 arm
    val live = graft.operators.Profile
      .entropyOfCounts(snapshot, "events.event_type").collect().head
    val batch = graft.operators.Profile
      .entropyOf(rows.toDF().select(col("event_type").as("v")),
        "events.event_type").collect().head
    assert(live === batch)
    // hand check: n=16 non-null, NULLs accounted, entropy positive
    assert(live.getLong(1) === 16L && live.getLong(2) === 2L &&
      live.getLong(4) > 0L)
  }
}
