package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** w16 retention-cohort semantics: explicit Monday-anchored integer week
  * buckets, per-user cohort = first active week, one row per
  * (cohort, offset) with distinct-user counts.
  */
class CohortSpec extends SparkSuite {

  import spark.implicits._

  test("hand-built cohort triangle: offsets, multi-event weeks, NULL hygiene") {
    // week anchor: 1970-01-05 is a Monday; 2024-01-01 is also a Monday
    // (week index 2817), so the fixture's weeks are unambiguous
    val rows = Seq(
      // user 1: first week W, active W and W+2 (twice — must count once)
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-15 10:00:00"), (1L, "2024-01-16 11:00:00"),
      // user 2: same cohort week (joins on Sunday), active W+1
      (2L, "2024-01-07 23:00:00"), (2L, "2024-01-08 01:00:00"),
      // user 3: later cohort W+2 only
      (3L, "2024-01-17 09:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
      // NULL user / NULL ts rows must not create phantom cohorts
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], "2024-01-01 10:00:00"),
        (java.lang.Long.valueOf(9L), null.asInstanceOf[String]))
        .toDF("user_id", "ts_s")
        .select(col("user_id"), col("ts_s").cast("timestamp").as("ts")))
    val got = Monitoring.retentionCohortsOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = 2817L // (2024-01-01 − 1970-01-05) / 7
    assert(got === Map(
      (w, 0L) -> 2L,      // users 1 and 2 join in week W
      (w, 1L) -> 1L,      // user 2 returns in W+1
      (w, 2L) -> 1L,      // user 1 returns in W+2 (two events, one user)
      (w + 2, 0L) -> 1L), // user 3's own cohort
      s"got $got")
  }

  test("w17 rolling actives: hand window, within-window dedup, observed-day ends") {
    val rows = Seq(
      (1L, "2024-03-01 10:00:00"),
      (1L, "2024-03-03 10:00:00"),   // user 1 twice inside one window → once
      (2L, "2024-03-03 11:00:00"),
      (3L, "2024-03-20 09:00:00"))   // isolated day far outside
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val got = Monitoring.rollingActivesOf(rows).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // observed days: 03-01, 03-03, 03-20. Windows END on observed days:
    //  03-01: users active in [02-24, 03-01] = {1}            → 1
    //  03-03: users active in [02-26, 03-03] = {1, 2}         → 2
    //  03-20: {3}                                             → 1
    assert(got === Map("2024-03-01" -> 1L, "2024-03-03" -> 2L,
      "2024-03-20" -> 1L), s"got $got")
  }

  test("w17 equals a per-day brute-force recomputation on the fixture") {
    val ud = graft.Catalog.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val expectedUsers = ud.map(_._2).map { end =>
      end.toString -> ud.filter { case (_, d) =>
        !d.isAfter(end) && d.isAfter(end.minusDays(Monitoring.RollingWindowDays))
      }.map(_._1).size.toLong
    }.toMap
    val got = Monitoring.rollingActives(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got === expectedUsers, s"diff: ${got.toSet.diff(expectedUsers.toSet)}")
  }

  test("w18 HLL twin: same day set as w17, band holds, and the sketch is " +
    "genuinely approximate at scale (not a disguised exact count)") {
    val exact = Monitoring.rollingActives(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val got = Monitoring.rollingActivesApprox(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet === exact.keySet, "day sets must agree")
    got.foreach { case (d, n, inBand) =>
      assert(n === exact(d), s"exact column drifted on $d")
      assert(inBand, s"estimate out of band on $d")
    }
    // non-vacuity: on a fixture wide enough to stress the sketch, the
    // estimate must DIFFER from exact somewhere (else the band boolean
    // is a tautology) while still landing inside the band
    import spark.implicits._
    val wide = (1L to 60000L).map(u => (u, f"2024-05-${(u % 3) + 1}%02d 10:00:00"))
      .toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val wExact = Monitoring.rollingActivesOf(wide).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val wApprox = wide
      .select(col("user_id"),
        expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)").as("d"))
      .distinct()
      .groupBy(col("d")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .select(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val total = wExact.values.max // the last window sees all 60k users
    assert(wApprox != total,
      s"HLL returned the exact 60k count — the fixture doesn't stress the sketch")
    assert(math.abs(wApprox - total) <= math.max(3L, total / 10),
      s"estimate $wApprox breaches the band around $total")
  }

  test("every user contributes exactly once per (cohort, offset), offset 0 is full") {
    val got = Monitoring.retentionCohorts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // offset-0 rows over all cohorts sum to the distinct active user count
    val users = graft.Catalog.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(got.filter(_._2 == 0L).map(_._3).sum === users,
      "every user must appear in its own cohort at offset 0")
    assert(got.forall(_._2 >= 0L), "offsets are relative to the FIRST week")
  }
}
