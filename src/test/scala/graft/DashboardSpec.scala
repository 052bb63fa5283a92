package graft

import org.apache.spark.sql.functions._

/** Facade assembly (SURVEY.md §3 traces). */
class DashboardSpec extends SparkSuite {

  test("index payload: every section materializes") {
    val p = Dashboard.index(spark, sfDir)
    assert(p.slowQueries.count() > 0)
    assert(p.activeUsers.head().getLong(0) > 0)
    assert(p.totalSessions.head().getLong(0) == 1000L)
    assert(p.topResourceConsumers.count() == 20)
    assert(p.usersWithRoles.count() == 150)
  }

  test("concurrent index materialization returns every section") {
    val counts = Dashboard.collectIndexConcurrently(spark, sfDir)
    assert(counts.size == 12)
    assert(counts("total_sessions") == 1L) // one aggregate row
    assert(counts("top_consumers") == 20L)
    assert(counts.values.forall(_ >= 0L))
  }

  test("every index section is bounded by the serving cap") {
    val cap = 7
    val counts = Dashboard.collectIndexConcurrently(spark, sfDir, sectionCap = cap)
    counts.foreach { case (name, n) =>
      assert(n <= math.max(cap, 20L), s"section $name returned $n rows")
    }
    // row-set sections actually hit the cap (fixture has more rows than 7)
    assert(counts("slow_queries") == cap)
    assert(counts("blocked_sessions") == cap)
    assert(counts("users_roles") == cap)
  }

  test("index_resource payload: trend bounded at 50, decimated at 25") {
    val p = Dashboard.indexResource(spark, sfDir)
    assert(p.trend.count() == 50)
    assert(p.decimated.count() <= 25)
    assert(p.latestPerUser.count() == 15)
  }

  test("cpu grid: filters + pagination compose") {
    val page = Dashboard.cpuUsageGrid(spark, sfDir,
      Seq(col("event_type") === "view"), page = 1, pageSize = 5)
    assert(page.count() <= 5)
  }

  test("status flags and gauge bands") {
    val flagged = Dashboard.withStatusFlags(
      Catalog.events(spark, sfDir).limit(100))
    val bands = flagged.select("gauge_band").distinct()
      .collect().map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("red", "orange", "green")))
    assert(flagged.columns.contains("value_ok"))
  }
}
