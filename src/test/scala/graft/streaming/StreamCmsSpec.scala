package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** a12's online half: the Count-Min matrix maintained in streaming state
  * must equal the batch build over the same rows, under any micro-batch
  * split — the monoid-merge claim as an executed assertion.
  */
case class CmsEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamCmsSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val W = 32
  private val Divs = Seq(1L, 7L)

  test("streamed matrix equals the batch build across micro-batch splits") {
    import spark.implicits._
    val rows = (1 to 40).map(i =>
      CmsEv(i.toLong, ts("2024-01-01 10:00:00"), (i % 7).toLong, "click", 1.0))
    val mem = MemoryStream[CmsEv](spark)
    val q = Streams.streamingCms(mem.toDF(), W, Divs).writeStream
      .format("memory").queryName("cms_test").outputMode("complete").start()
    try {
      val (a, b) = rows.splitAt(13)
      mem.addData(a: _*)
      q.processAllAvailable()
      mem.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_test").collect().head
      .getSeq[Long](0)
    val batch = rows.toDF()
      .filter(col("user_id").isNotNull)
      .select(graft.operators.TextOps.hash60(
        col("user_id").cast("string")).as("h"))
      .agg(graft.expressions.SketchFunctions
        .cms_build(col("h"), W, Divs).as("cms"))
      .collect().head.getSeq[Long](0)
    assert(streamed == batch,
      s"state after two micro-batches diverged from the one-shot build")
    assert(batch.sum == 40L * Divs.length, "every event counted once per row")
  }
}
