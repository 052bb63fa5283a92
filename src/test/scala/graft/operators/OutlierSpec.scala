package graft.operators

import org.apache.spark.sql.functions.sum

import graft.SparkSuite

/** o1 Tukey-fence semantics on hand-built distributions: exact quartile
  * interpolation, fence arithmetic, outlier counting, NULL handling.
  */
class OutlierSpec extends SparkSuite {

  import spark.implicits._

  test("fences and outlier counts match the hand computation") {
    // type A: values 1..5 plus a wild 100.
    // sorted [1,2,3,4,5,100], n=6: h25 = 1.25 -> q1 = 2*0.75+3*0.25... no:
    // exact interpolation h = (n-1)*q = 1.25 -> q1 = v[1] + 0.25*(v[2]-v[1])
    //   = 2 + 0.25 = 2.25; h75 = 3.75 -> q3 = 4 + 0.75*1 = 4.75
    // IQR = 2.5 -> lo = 2.25 - 3.75 = -1.5, hi = 4.75 + 3.75 = 8.5
    // outliers: only 100 -> 1 of 6
    val events = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("A", _)) ++
      Seq(10.0, 10.0, 10.0, 10.0).map(("B", _)))
      .toDF("event_type", "value")
    val rows = Relational.outlierBoundsOf(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows("A") == ((6L, 1L, -1.5, 8.5)))
    // type B: constant distribution -> IQR 0, fences collapse to the
    // value, nothing is outside a closed fence
    assert(rows("B") == ((4L, 0L, 10.0, 10.0)))
  }

  test("o3 MAD: hand computation, and robustness where Tukey fences break down") {
    // clean: [1..7] + wild 100: med of [1,2,3,4,5,6,7,100] = 4.5;
    // adevs = [3.5,2.5,1.5,0.5,0.5,1.5,2.5,95.5] -> MAD = med = 2.0
    // threshold 2*1.4826*3 = 8.8956 -> only 100 (adev 95.5) is out
    val clean = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0).map(("A", _))
    // contaminated: 6 good values near 10, FIVE junk at 1000 (38% of
    // the feed. q3 lands inside the junk mass -> the Tukey hi fence
    // blows past 1000 and o1 counts ZERO outliers; the median/MAD stay
    // with the good mass and o3 still flags all 5)
    val dirty = (Seq(9.0, 9.5, 10.0, 10.0, 10.5, 11.0) ++
      Seq.fill(5)(1000.0)).map(("B", _))
    val df = (clean ++ dirty).toDF("event_type", "value")
    val mad = Relational.madOutliersOf(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(mad("A") == ((8L, 1L, 4.5, 2.0)))
    // B sorted: [9, 9.5, 10, 10, 10.5, 11, 1000×5], n=11 -> med = v[5] = 11;
    // adevs sorted [0, 0.5, 1, 1, 1.5, 2, 989×5] -> MAD = 2; threshold
    // 2*1.4826*3 = 8.8956 -> the five 989-deviation rows flag
    val (bn, bOut, bMed, bMad) = mad("B")
    assert(bn == 11L && bOut == 5L, s"MAD must flag all junk: $bOut")
    assert(bMed == 11.0 && bMad == 2.0)
    // the same contaminated feed defeats the quartile fences
    val tukeyB = Relational.outlierBoundsOf(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap.apply("B")
    assert(tukeyB == 0L,
      "expected the 38%-contaminated feed to defeat Tukey fences " +
        s"(the scenario o3 exists for), got $tukeyB outliers")
  }

  test("h2 buckets by equal width; max lands in the last bucket; w=0 collapses to bucket 0") {
    val events = (Seq(0.0, 1.0, 5.0, 9.9, 10.0).map(("A", _)) ++
      Seq(7.0, 7.0).map(("B", _)))
      .toDF("event_type", "value")
    val got = Relational.valueHistogramOf(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // A: range [0,10], w=1 → 0.0→b0, 1.0→b1, 5.0→b5, 9.9→b9, 10.0 capped→b9
    assert(got == Map(
      ("A", 0L) -> 1L, ("A", 1L) -> 1L, ("A", 5L) -> 1L, ("A", 9L) -> 2L,
      ("B", 0L) -> 2L), s"got $got")
  }

  test("h2 excludes NULL values from distribution mass") {
    val events = Seq(("A", Some(1.0)), ("A", None), ("A", Some(2.0)))
      .toDF("event_type", "value")
    assert(Relational.valueHistogramOf(events).agg(sum("n"))
      .head().getLong(0) == 2L)
  }

  test("o2 approx-fence counts agree with exact inside the band on hand-built and fixture data") {
    // hand-built: at fixture-sized groups the rank error (n/accuracy) is
    // far below one rank, so approx == exact and every band bit is true
    val events = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("A", _)) ++
      Seq(10.0, 10.0, 10.0, 10.0).map(("B", _)))
      .toDF("event_type", "value")
    val rows = Relational.outlierBoundsApproxOf(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows("A")._1 == 6L && rows("A")._3, s"got $rows")
    assert(rows("B") == ((4L, 0L, true)))
    // the exact columns are o1's (same fence rule, same accounting)
    val o1 = Relational.outlierBoundsOf(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.view.mapValues(v => (v._1, v._2)).toMap == o1)
    // and the real fixture agrees everywhere — the claim the oracle pins
    val fx = Relational.outlierBoundsApprox(spark, sfDir).collect()
    assert(fx.nonEmpty && fx.forall(_.getBoolean(3)))
  }

  test("h3 drift: shared union bounds, exact L1 over aligned buckets, NULL/degenerate edges") {
    import org.apache.spark.sql.functions.col
    // type A over [0,10] (w=1): old = ids 1-4, new = ids 3-5 —
    //   old buckets: id1 0.0→b0, id2 10.0→b9(cap), id3 5.0→b5, id4 9.9→b9
    //   new buckets: id3 5.0→b5, id4 9.9→b9, id5 0.5→b0
    //   per bucket |old−new|: b0 |1−1|=0, b5 0, b9 |2−1|=1 → L1=1, 1 changed
    // type B: constant value in both → bucket 0 both sides, zero drift
    // plus a NULL value and a row in NEITHER snapshot — both excluded
    val events = Seq(
      (1L, "A", Some(0.0)), (2L, "A", Some(10.0)), (3L, "A", Some(5.0)),
      (4L, "A", Some(9.9)), (5L, "A", Some(0.5)),
      (6L, "B", Some(7.0)), (7L, "B", Some(7.0)),
      (8L, "A", None), (99L, "A", Some(3.0)))
      .toDF("event_id", "event_type", "value")
    val got = Relational.histogramDriftOf(events,
        col("event_id") <= 4 || col("event_id") === 6L,
        (col("event_id") >= 3 && col("event_id") <= 7))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((4L, 3L, 1L, 1L)), s"got $got")
    assert(got("B") == ((1L, 2L, 1L, 1L)), s"got $got")
  }

  test("o4 KS: hand-computed supremum, ties, identical samples, shared rows") {
    import org.apache.spark.sql.functions.col
    // old = {1,2,3}, new = {2,4}: distinct values 1,2,3,4
    //   cum_old 1,2,3,3 / cum_new 0,1,1,2; gaps |c_o*2 - c_n*3|:
    //   v=1: 2; v=2: 1; v=3: 3; v=4: 0 -> d_num=3, D = 3/(3*2) = 0.5
    val df = Seq(
      ("A", 1.0, "old"), ("A", 2.0, "old"), ("A", 3.0, "old"),
      ("A", 2.0, "new"), ("A", 4.0, "new"),
      // type B: identical samples (one row shared by BOTH sides) -> D = 0
      ("B", 7.0, "both"), ("B", 9.0, "both"))
      .toDF("event_type", "value", "s")
    val got = Relational.ksDriftOf(df,
        col("s") === "old" || col("s") === "both",
        col("s") === "new" || col("s") === "both")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((3L, 2L, 3L, 500000L)), s"got $got")
    assert(got("B") == ((2L, 2L, 0L, 0L)))
    // within-sample TIES collapse into one ECDF step, not two:
    // old = {1,1,3} vs new = {1,3}: v=1 gap |2*2-1*3|=1; v=3 gap 0
    //   -> d_num=1, D=1/6 -> 166667 ppm
    val ties = Seq(("T", 1.0, "old"), ("T", 1.0, "old"), ("T", 3.0, "old"),
      ("T", 1.0, "new"), ("T", 3.0, "new")).toDF("event_type", "value", "s")
    val t = Relational.ksDriftOf(ties,
        col("s") === "old", col("s") === "new")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(t.toSeq == Seq((3L, 2L, 1L, 166667L)), s"got ${t.toSeq}")
    // a type in only ONE snapshot has no two-sample statistic: ks_ppm is
    // NULL, never an Infinity from the zero denominator
    val oneSided = Seq(("O", 1.0, "old"), ("O", 2.0, "old"))
      .toDF("event_type", "value", "s")
    val o = Relational.ksDriftOf(oneSided,
        col("s") === "old", col("s") === "new").collect().head
    assert(o.getLong(1) == 2L && o.getLong(2) == 0L && o.isNullAt(4),
      s"one-sided type must yield NULL ks_ppm: $o")
  }

  test("o4 detects a pure location shift that h3's shared bounds can blur") {
    import org.apache.spark.sql.functions.col
    // new = old + 0.6 within one h2 bucket width: every value moves but
    // few cross a bucket edge; KS sees the full shift
    val old = (1 to 50).map(i => ("S", i.toDouble, "old"))
    val shifted = (1 to 50).map(i => ("S", i.toDouble + 0.6, "new"))
    val df = (old ++ shifted).toDF("event_type", "value", "s")
    val ks = Relational.ksDriftOf(df, col("s") === "old", col("s") === "new")
      .collect().head
    // at x = k+0.6 the old CDF leads by exactly one step everywhere
    // except the extremes -> D = 1/50
    assert(ks.getLong(3) == 50L * 1 * 1 * 50 / 50 * 1)
    assert(ks.getLong(4) == 20000L, s"got ${ks.getLong(4)}")
  }

  test("o5 seasonal baselines: the same value is anomalous at 3am, normal at 8pm") {
    import org.apache.spark.sql.functions.col
    val ts = (h: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:0$i%1d:00")
    // hour 3 baseline is quiet (med 1, mad 0): the 10 is the anomaly.
    // hour 20 baseline is busy (med 10, mad 1): 10s are normal, only the
    // 30 crosses the fence — a GLOBAL rule could never say both.
    val rows =
      Seq(1.0, 1.0, 1.0, 1.0, 10.0).zipWithIndex.map { case (v, i) =>
        ("A", ts(3, i), v) } ++
      Seq(8.0, 10.0, 10.0, 10.0, 12.0, 30.0).zipWithIndex.map { case (v, i) =>
        ("A", ts(20, i), v) }
    val df = rows.toDF("event_type", "ts", "value")
    val got = Relational.seasonalAnomalyOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // hour 20: med 10; adevs sorted [0,0,0,2,2,20] -> mad = 1 (interp);
    // threshold 4.4478 -> only the 30 (adev 20) flags
    assert(got == Map(
      ("A", 3L) -> ((5L, 1L, 1.0, 0.0)),
      ("A", 20L) -> ((6L, 1L, 10.0, 1.0))), s"got $got")
  }

  test("o6 CUSUM: hand computation, flat series, NULL ts excluded") {
    import org.apache.spark.sql.functions.{col, lit}
    // type A daily counts [1, 4, 1]: n=3, total=6, d = 3x−6 = [−3, 6, −3],
    // P = [−3, 3, 0]. Upward recurrence S = [0, 6, 3] → max 6 (the day-2
    // burst); downward D = [3, 0, 3] → max 3. Asymmetric by design — the
    // two detectors must not be mirrors of each other on this series.
    def day(d: Int, n: Int, t: String) =
      Seq.fill(n)((t, s"2024-01-0$d 10:00:00"))
    val events = (day(1, 1, "A") ++ day(2, 4, "A") ++ day(3, 1, "A") ++
      day(1, 2, "B") ++ day(2, 2, "B") ++ Seq(("A", null: String)))
      .toDF("event_type", "ts_s")
      .select(col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val got = Relational.cusumDriftOf(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the NULL-ts event must not create a phantom day or shift any count
    assert(got("A") == ((3L, 6L, 6L, 3L)), s"got ${got("A")}")
    // flat series: deviations all zero, both detectors silent
    assert(got("B") == ((2L, 4L, 0L, 0L)), s"got ${got("B")}")
  }

  test("o7 change point: hand series, uniform tie-break, single-day exclusion, NULL ts") {
    import org.apache.spark.sql.functions.col
    def day(d: Int, n: Int, t: String) =
      Seq.fill(n)((t, f"2024-01-$d%02d 10:00:00"))
    // A: [2,2,2,8,8,8] — n=6, S=30, P_t = 6·cum − 30t =
    // [-18,-36,-54,-36,-18,0] → argmax|P| at t=3 (54): the last day of
    // the old regime. mean_before = 2e6 exact, mean_after = 8e6 exact.
    val a = (1 to 3).flatMap(d => day(d, 2, "A")) ++
      (4 to 6).flatMap(d => day(d, 8, "A"))
    // B: flat [3,3] — every P_t = 0, earliest-day tie-break → day 1,
    // split_stat 0, means 3e6 both sides (t*=1 < n, so never div-by-0)
    val b = day(1, 3, "B") ++ day(2, 3, "B")
    // C: one day only — no split candidate, excluded
    val c = day(1, 5, "C")
    val events = (a ++ b ++ c ++ Seq(("A", null: String)))
      .toDF("event_type", "ts_s")
      .select(col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val got = Relational.changePointOf(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDate(2).toString, r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set("A", "B"), s"single-day C must be excluded: $got")
    assert(got("A") === ((6L, "2024-01-03", 54L, 2000000L, 8000000L)),
      s"got ${got("A")}")
    assert(got("B") === ((2L, "2024-01-01", 0L, 3000000L, 3000000L)),
      s"got ${got("B")}")
  }

  test("o7 localizes the shift the detection statistic only signals") {
    import org.apache.spark.sql.functions.col
    // a long steady series with a mid-series regime change at a known
    // day: localization must land exactly there, whatever the magnitudes
    val rows = (1 to 20).flatMap { d =>
      val n = if (d <= 12) 3 else 9
      Seq.fill(n)(("T", f"2024-02-$d%02d 08:00:00"))
    }
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val r = Relational.changePointOf(events).collect()(0)
    assert(r.getDate(2).toString == "2024-02-12",
      s"change day must be the last old-regime day, got ${r.getDate(2)}")
    assert(r.getLong(4) == 3000000L && r.getLong(5) == 9000000L)
  }

  test("o6 closed form equals the literal sequential recurrence on random series") {
    import org.apache.spark.sql.functions.col
    // 40 random daily-count series (one event_type each), evaluated in
    // ONE cusumDriftOf call; the reference is the textbook recurrence
    // S_t = max(0, S_{t−1} + d_t) run literally in Scala. Fixed seed —
    // deterministic, but 40 shapes including spikes, dips, and plateaus.
    val rnd = new scala.util.Random(42)
    val series: Map[String, Seq[Int]] = (1 to 40).map { i =>
      s"T$i" -> Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(8))
    }.toMap
    // x = 0 days produce no rows at all (a day with zero events does not
    // appear in a count-per-day series) — mirror that in the reference
    val nonZero = series.map { case (t, xs) => t -> xs.filter(_ > 0) }
      .filter(_._2.nonEmpty)
    val rows = nonZero.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.flatMap { case (x, day) =>
        Seq.fill(x)((t, f"2024-01-${day + 1}%02d 12:00:00"))
      }
    }
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val got = Relational.cusumDriftOf(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    nonZero.foreach { case (t, xs) =>
      val n = xs.size.toLong
      val total = xs.map(_.toLong).sum
      val d = xs.map(x => n * x - total)
      val up = d.scanLeft(0L)((s, di) => math.max(0L, s + di)).max
      val down = d.scanLeft(0L)((s, di) => math.max(0L, s - di)).max
      assert(got(t) == ((up, down)),
        s"$t: series $xs expected ($up, $down) got ${got(t)}")
    }
  }

  test("NULL values count into n but never into outliers or quartiles") {
    val events = Seq(("A", Some(1.0)), ("A", Some(2.0)), ("A", Some(3.0)),
      ("A", None), ("A", Some(1000.0)))
      .toDF("event_type", "value")
    val r = Relational.outlierBoundsOf(events).collect().head
    // quartiles over [1,2,3,1000]: h25=0.75 -> 1.75; h75=2.25 -> 3+0.25*997
    // = 252.25; IQR=250.5 -> lo=-373.0, hi=627.999... no outlier below;
    // 1000 > hi -> 1 outlier. NULL row: counted in n, not comparable.
    assert(r.getLong(1) == 5L && r.getLong(2) == 1L)
  }
}
