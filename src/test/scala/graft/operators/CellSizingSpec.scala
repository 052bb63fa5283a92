package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.lifecycle.Stats

/** Stats-driven grid-cell sizing for the interval-join family (round-10
  * verdict item #6): `cellSecondsForTable` derives the j9 grid width from
  * a table's persisted ANALYZE min/max + row count the way j10's
  * `saltsForTable` derives salt fan-out from hot-key mass — and the
  * derived width changes only the PLAN's fan-out, never the results.
  */
class CellSizingSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cellSecondsFor formula: budget-sized widths, clamps, and fallbacks") {
    // 1 day span, 86400 rows, budget 300 → 300 s cells (1 row/s density)
    assert(Relational.cellSecondsFor(86400L, 86400L, 300L) === 300L)
    // 10× denser points → 10× narrower cells, same per-cell population
    assert(Relational.cellSecondsFor(86400L, 864000L, 300L) === 30L)
    // floor: denser than 1 row/µs still yields a 1 s grid, never 0
    assert(Relational.cellSecondsFor(1L, Long.MaxValue / 2, 300L) === 1L)
    // cap: a sparse multi-decade table can't exceed the one-year cell
    assert(Relational.cellSecondsFor(86400L * 365 * 30, 10L, 300L)
      === 86400L * 365)
    // empty / constant-ts tables fall back to the caller's default
    assert(Relational.cellSecondsFor(0L, 100L) === Relational.RangeBucketSec)
    assert(Relational.cellSecondsFor(3600L, 0L, default = 42L) === 42L)
  }

  test("derived width on a skewed fixture differs from the gate default " +
    "and the grids agree row-for-row") {
    import spark.implicits._
    // skewed points: a dense burst (one point per second for 10 min) plus
    // a sparse week-long tail — average density is far from the 300 s
    // gate default's assumption
    val base = ts("2024-03-01 00:00:00").getTime
    val burst = (0 until 600).map(i =>
      (i.toLong, new Timestamp(base + i * 1000L)))
    val tail = (0 until 100).map(i =>
      (1000L + i, new Timestamp(base + i * 6048L * 1000L)))
    val points: DataFrame = (burst ++ tail).toDF("view_id", "view_ts")
    val wins: DataFrame = Seq(
      (1L, ts("2024-03-01 00:01:00"), ts("2024-03-01 00:06:00")), // in-burst
      (2L, ts("2024-03-03 00:00:00"), ts("2024-03-04 00:00:00")), // tail day
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))) // empty
      .toDF("win_id", "win_start", "win_end")

    val tmp = Files.createTempDirectory("graft_cells").toString
    val tablePath = s"$tmp/points"
    points.write.parquet(tablePath)
    Stats.analyze(spark, tablePath, withHotKeys = false)

    val derived = Relational.cellSecondsForTable(spark, tablePath,
      "view_ts", perCellBudget = 100L)
    // span ≈ 599k s over 700 rows at budget 100 → ~86k s cells: the stats
    // see a sparse table and widen the grid ~285× past the 300 s default
    val spanSec = (tail.last._2.getTime - base) / 1000L
    val expected = Relational.cellSecondsFor(spanSec, 700L, 100L)
    assert(derived === expected, s"derived $derived != formula $expected")
    assert(derived != Relational.RangeBucketSec,
      "fixture must actually exercise a non-default width")

    // the width is a plan knob, not a semantics knob: derived-width and
    // fixed-width grids must produce identical per-window counts
    val key = (df: DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val fixed = key(Relational.rangeJoinCounts(wins, points))
    val auto = key(Relational.rangeJoinCounts(wins, points, derived))
    assert(auto === fixed, s"derived-width results drifted: $auto vs $fixed")
    // window 1: burst seconds [60, 360) → 300 points; window 2: tail
    // points 6048·i ∈ [172800, 259200) → i ∈ [29, 42] → 14; window 3: 0
    assert(fixed === Set((1L, 300L), (2L, 14L), (3L, 0L)))

    // un-analyzed table → gate default (the saltsForTable fallback rule)
    assert(Relational.cellSecondsForTable(spark, s"$tmp/nope", "view_ts")
      === Relational.RangeBucketSec)
    // unknown column → gate default
    assert(Relational.cellSecondsForTable(spark, tablePath, "no_such")
      === Relational.RangeBucketSec)
  }
}
