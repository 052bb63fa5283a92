package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** RangeJoinRewrite: naive timestamp interval joins become grid
  * equi-joins (no nested loop), with identical results; guarded shapes
  * stay untouched.
  */
class RangeJoinRewriteSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val wins: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:02:00"), ts("2024-01-01 10:08:00")),
      (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")),
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:10:00")),
      // inverted interval: must match nothing, and must not break the
      // generated sequence
      (4L, ts("2024-01-03 00:10:00"), ts("2024-01-03 00:00:00")))
      .toDF("win_id", "lo", "hi")
  }

  private lazy val pts: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, ts("2024-01-01 10:02:00")), // == lo of 1 -> in (inclusive)
      (11L, ts("2024-01-01 10:07:00")), // in 1 and 2
      (12L, ts("2024-01-01 10:08:00")), // == hi of 1 -> out (strict), in 2
      (13L, ts("2024-01-03 00:05:00"))) // only inside inverted 4 -> nothing
      .toDF("pid", "p")
  }

  private def expected = Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L))

  test("interval join rewrites to a grid equi-join with identical results") {
    val joined = pts.join(wins, pts("p") >= wins("lo") && pts("p") < wins("hi"))
      .select(col("pid"), col("win_id"))
    val plan = joined.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"interval join must not plan a nested loop:\n$plan")
    assert(plan.toString.contains("graft_range_cell"),
      s"expected the grid rewrite in:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got")
  }

  test("bound-direction variants and reversed join sides rewrite too") {
    // intervals on the left, mirrored comparisons, inclusive upper bound
    val joined = wins.join(pts,
      wins("lo") <= pts("p") && wins("hi") > pts("p"))
      .select(col("pid"), col("win_id"))
    val plan = joined.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got")
  }

  test("a cross-side equality conjunct suppresses the rewrite") {
    val joined = pts.join(wins,
      pts("pid") === wins("win_id") &&
        pts("p") >= wins("lo") && pts("p") < wins("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_range_cell"),
      s"equi-join shapes must stay untouched:\n$plan")
  }

  test("non-inner interval joins stay untouched") {
    val joined = pts.join(wins,
      pts("p") >= wins("lo") && pts("p") < wins("hi"), "left")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_range_cell"),
      s"outer joins must stay untouched:\n$plan")
    // and results are the plain outer-join semantics
    assert(joined.count() == 5) // 4 matches + unmatched pid 13
  }

  test("rewrite respects the configured bucket width") {
    spark.conf.set(RangeJoinRewrite.WidthConf, "60")
    try {
      val joined = pts.join(wins, pts("p") >= wins("lo") && pts("p") < wins("hi"))
        .select(col("pid"), col("win_id"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"got $got")
    } finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }
}
