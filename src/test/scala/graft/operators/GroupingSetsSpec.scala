package graft.operators

import graft.SparkSuite

/** g5 explicit grouping sets: exactly the requested slices, each equal to
  * its standalone groupBy, in one scan + one Expand.
  */
class GroupingSetsSpec extends SparkSuite {

  private lazy val rows = Relational.groupingSetsSummary(spark, sfDir).collect()

  test("exactly the two 1-D slices appear (no cross cells, no grand total)") {
    val gids = rows.map(_.getLong(2)).toSet
    // over (l_returnflag, l_linestatus): gid 1 = {returnflag} slice
    // (linestatus aggregated), gid 2 = {linestatus} slice — never 0
    // (the cross) or 3 (the grand total)
    assert(gids == Set(1L, 2L), s"got gids $gids")
    rows.foreach { r =>
      if (r.getLong(2) == 1L)
        assert(!r.isNullAt(0) && r.isNullAt(1), s"slice-1 shape wrong: $r")
      else
        assert(r.isNullAt(0) && !r.isNullAt(1), s"slice-2 shape wrong: $r")
    }
  }

  test("each slice equals its standalone groupBy") {
    import org.apache.spark.sql.functions._
    val l = graft.Catalog.lineitem(spark, sfDir)
    val byFlag = l.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val slice1 = rows.filter(_.getLong(2) == 1L)
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(slice1 == byFlag, s"flag slice diverged: $slice1 vs $byFlag")
  }

  test("one scan, one Expand of factor 2 (not CUBE's 4)") {
    val df = Relational.groupingSetsSummary(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1,
      s"must scan lineitem once:\n$plan")
    assert("Expand".r.findAllIn(plan).length == 1,
      s"grouping sets must plan exactly one Expand:\n$plan")
    // and it answers with strictly fewer rows than CUBE over the same
    // dimensions — the cross cells and the grand total never materialize
    val cubeRows = Relational.cubeSummary(spark, sfDir).count()
    assert(rows.length < cubeRows,
      s"expected fewer rows than CUBE's $cubeRows, got ${rows.length}")
  }
}
