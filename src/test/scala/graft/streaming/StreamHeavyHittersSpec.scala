package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** a10's online half (round-12 verdict item #4): Misra-Gries state
  * maintained in streaming complete mode. The twin claim is calibrated to
  * what MG actually promises — the raw state is NOT merge-order canonical
  * (k=1 over [a,b,c] ends {c:1}; over [c,b,a] ends {a:1}), so the tests
  * pin (1) the merge-invariant DETERMINISTIC guarantee under micro-batch
  * splits, (2) that the subtract-merge across batches genuinely fired,
  * and (3) exact split-equality with the one-shot batch build in the
  * ≤ k-distinct regime where no decrement can ever fire.
  */
case class HhEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamHeavyHittersSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val K = 3

  private def rowsOf(counts: (String, Int)*): Seq[HhEv] = {
    var id = 0L
    counts.flatMap { case (key, n) =>
      (1 to n).map { _ =>
        id += 1
        HhEv(id, ts("2024-01-01 10:00:00"), id % 5, key, 1.0)
      }
    }
  }

  private def runSplit(rows: Seq[HhEv], splits: Seq[Int],
      name: String): Map[String, Long] = {
    import spark.implicits._
    val mem = MemoryStream[HhEv](spark)
    val q = Streams.streamingHeavyHitters(mem.toDF(), K).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      var rest = rows
      splits.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        rest = tail
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      if (rest.nonEmpty) { mem.addData(rest: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("streamed sketch obeys the deterministic MG guarantee under a " +
      "micro-batch split, and the subtract-merge across batches fired") {
    // exact: click 30, view 15, error 9, signup 6 — n = 60, n/(k+1) = 15;
    // click (30 > 15) is the one TRUE heavy hitter and MUST survive any
    // merge tree with est in [15, 30]
    val exact = Map("click" -> 30L, "view" -> 15L, "error" -> 9L,
      "signup" -> 6L)
    val rows = rowsOf("click" -> 30, "view" -> 15, "error" -> 9,
      "signup" -> 6)
    val n = rows.size.toLong
    val bound = n / (K + 1)
    // interleave keys across three micro-batches so every batch carries a
    // mix and the cross-batch merges must reconcile overlapping supports
    val shuffled = rows.sortBy(_.event_id % 7)
    val streamed = runSplit(shuffled, Seq(20, 20), "hh_guarantee")
    assert(streamed.size <= K, s"state exceeded k: $streamed")
    assert(streamed.contains("click"),
      s"true heavy hitter lost by the merge: $streamed")
    streamed.foreach { case (key, est) =>
      assert(est <= exact(key), s"$key overestimated: $est > ${exact(key)}")
      assert(exact(key) - est <= bound,
        s"$key below the n/(k+1) band: $est vs ${exact(key)}")
    }
    // 4 distinct keys into <= 3 state slots: at least one key with
    // positive exact count was decremented out — the subtract-merge is
    // exercised, not just accumulation
    assert(exact.keySet.diff(streamed.keySet).nonEmpty,
      "no key was ever dropped — the decrement path never ran")
    // the one-shot batch build is judged by the identical guarantee
    import spark.implicits._
    val batch = rows.toDF().filter(col("event_type").isNotNull)
      .agg(graft.expressions.SketchFunctions
        .heavy_hitters(col("event_type"), K).as("hh"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch.contains("click") && batch.size <= K)
    batch.foreach { case (key, est) =>
      assert(est <= exact(key) && exact(key) - est <= bound)
    }
  }

  test("<= k distinct keys: no decrement can fire, so the streamed state " +
      "EQUALS the exact counts and the one-shot batch build under any " +
      "split (the StreamCmsSpec equality, in MG's exact regime)") {
    val rows = rowsOf("click" -> 7, "view" -> 4, "error" -> 2)
    val exact = Map("click" -> 7L, "view" -> 4L, "error" -> 2L)
    // two different splits must both land on the exact counts
    assert(runSplit(rows, Seq(5, 4), "hh_exact_a") === exact)
    assert(runSplit(rows.reverse, Seq(1, 11), "hh_exact_b") === exact)
    import spark.implicits._
    val batch = rows.toDF()
      .agg(graft.expressions.SketchFunctions
        .heavy_hitters(col("event_type"), K).as("hh"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch === exact, "one-shot build must also be exact here")
  }
}
