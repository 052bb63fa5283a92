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

  test("integral (long) interval joins rewrite too — the b5 token-position shape") {
    import spark.implicits._
    // token-offset intervals, including NEGATIVE positions (epoch-relative
    // offsets): truncated division is monotonic, so the grid stays a
    // superset and the residual keeps it exact
    val spans = Seq(
      (1L, 100L, 700L),
      (2L, -650L, -350L),   // fully negative interval
      (3L, -100L, 100L))    // spans zero (trunc-div's asymmetric cell)
      .toDF("win_id", "lo", "hi")
    val pts = Seq((10L, 100L), (11L, 699L), (12L, 700L), (13L, -400L),
      (14L, -650L), (15L, 0L), (16L, -100L), (17L, 101L), (18L, -651L))
      .toDF("pid", "p")
    val joined = pts.join(spans,
      pts("p") >= spans("lo") && pts("p") < spans("hi"))
      .select(col("pid"), col("win_id"))
    val plan = joined.queryExecution.executedPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"integral interval join must not plan a nested loop:\n$plan")
    assert(plan.toString.contains("graft_range_cell"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Set((10L, 1L), (11L, 1L), (13L, 2L), (14L, 2L),
      (15L, 3L), (16L, 3L), (17L, 1L))
    assert(got == brute, s"got $got")
  }

  test("int-typed bounds rewrite and match the long semantics") {
    import spark.implicits._
    val spans = Seq((1, 5, 900), (2, -300, 4)).toDF("win_id", "lo", "hi")
    val pts = Seq((10, 5), (11, 899), (12, 900), (13, 0), (14, -300), (15, 4))
      .toDF("pid", "p")
    val joined = pts.join(spans,
      pts("p") >= spans("lo") && pts("p") < spans("hi"))
      .select(col("pid"), col("win_id"))
    assert(joined.queryExecution.executedPlan.toString.contains("graft_range_cell"))
    val got = joined.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((10, 1), (11, 1), (13, 2), (14, 2)), s"got $got")
  }

  test("mixed-type bounds stay untouched (no implicit cast hides a rewrite)") {
    import spark.implicits._
    val spans = Seq((1L, 5L, 900)).toDF("win_id", "lo", "hi") // long lo, int hi
    val pts = Seq((10L, 50L)).toDF("pid", "p")
    val joined = pts.join(spans,
      pts("p") >= spans("lo") && pts("p") < spans("hi"))
    // Spark's analyzer casts hi up to long INSIDE the predicate, so the
    // bound is no longer a plain attribute — guarded out, still correct
    assert(!joined.queryExecution.executedPlan.toString.contains("graft_range_cell"))
    assert(joined.count() == 1)
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
