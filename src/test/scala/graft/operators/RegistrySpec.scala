package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** t1 smoke over the full query registry (SURVEY.md §5): every catalogued
  * operator executes on the sf0.001 fixtures, plus hand-computed assertions
  * per operator family pinning the semantics the DuckDB oracle re-checks at
  * sf0.01.
  */
class RegistrySpec extends SparkSuite {

  test("every registered query has an oracle and executes") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.registry.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      val n = df.count()
      assert(n >= 0, s"${q.name}: count failed")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a2 total sessions = fixture row count") {
    val n = Monitoring.totalSessions(spark, sfDir).head().getLong(0)
    assert(n == 1000L) // sf0.001 events row count, TESTDATA.md
  }

  test("p3 slow queries: every duration exceeds threshold, sorted desc") {
    val rows = Monitoring.slowQueries(spark, sfDir)
      .select("duration_s").collect().map(_.getLong(0))
    assert(rows.forall(_ > 900))
    assert(rows.sameElements(rows.sorted(Ordering[Long].reverse)))
  }

  test("w2 decimation: ≤25 buckets, 5-minute aligned, newest-first") {
    val rows = Monitoring.decimate(spark, sfDir)
      .select("bucket").collect().map(_.getTimestamp(0).getTime)
    assert(rows.length <= 25)
    assert(rows.forall(_ % (5 * 60 * 1000) == 0), "bucket not 5-min aligned")
    assert(rows.sameElements(rows.sorted(Ordering[Long].reverse)))
  }

  test("w3 latest-per-user: one row per user, value matches max-ts event") {
    val df = Monitoring.latestPerUser(spark, sfDir)
    val users = df.select("user_id").collect().map(_.getLong(0))
    assert(users.distinct.length == users.length)
    // cross-check one user against a direct sort
    val ev = graft.Catalog.events(spark, sfDir)
    val u0 = users.head
    val expect = ev.filter(col("user_id") === u0)
      .orderBy(col("ts").desc, col("event_id").desc)
      .select("event_id").head().getLong(0)
    val got = df.filter(col("user_id") === u0).select("event_id").head().getLong(0)
    assert(got == expect)
  }

  test("w1 lag delta: first row per user has null delta; delta telescopes") {
    val rows = Monitoring.lagDelta(spark, sfDir)
      .select("user_id", "value", "delta").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      assert(rs.head.isNullAt(2), "first delta not null")
      val deltaSum = rs.tail.map(_.getDouble(2)).sum
      val valDiff = rs.last.getDouble(1) - rs.head.getDouble(1)
      assert(math.abs(deltaSum - valDiff) < 1e-6, "deltas don't telescope")
    }
  }

  test("t2 top-k returns exactly k rows in order") {
    val rows = Monitoring.topResourceConsumers(spark, sfDir)
      .select("net_price").collect().map(_.getDouble(0))
    assert(rows.length == 20)
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("j6 anti-join: results place no finished orders") {
    val anti = Relational.customersWithoutOrders(spark, sfDir)
    val o = graft.Catalog.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    val joined = anti.join(o, anti("c_custkey") === o("o_custkey")).count()
    assert(joined == 0)
  }

  test("g1 pricing summary groups on returnflag+linestatus") {
    val df = Relational.pricingSummary(spark, sfDir)
    val keys = df.select("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(keys.nonEmpty)
    // count_order totals must equal the filtered lineitem count
    val total = df.agg(sum("count_order")).head().getLong(0)
    val expect = graft.Catalog.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expect)
  }

  test("p10 pagination: page 3 follows page 2's last id") {
    def page(p: Int) = Relational.gridQuery(
      Seq(col("event_type") === "click", col("value") > 50.0), p, 10)(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0))
    val p2 = page(2)
    val p3 = page(3)
    assert(p2.length <= 10 && p3.length <= 10)
    if (p2.nonEmpty && p3.nonEmpty) assert(p2.last < p3.head)
  }
}
