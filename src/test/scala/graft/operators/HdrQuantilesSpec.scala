package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** p14 log2-bucket quantile semantics: hand-pinned bucket selection on a
  * constructed distribution, the zero edge, and the octave guarantee (the
  * true rank-statistic lies inside the reported bucket) on the fixture.
  */
class HdrQuantilesSpec extends SparkSuite {

  private def ev(rows: (String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "value")
  }

  test("hand distribution: bucket selection and bounds are exact") {
    // micro values 1..8 → buckets 1,2,2,3,3,3,3,4 (bitlength)
    val df = ev((1 to 8).map(i => "a" -> i / 1000000.0): _*)
    val got = Relational.hdrQuantilesOf(df).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // φ=50: target ⌈4⌉ → cum(b3)=7 ≥ 4, cum(b2)=3 < 4 → bucket 3 = [4,7]
    assert(got(50) == ((3L, 4L, 7L)), s"got $got")
    // φ=95/99: target 8 → bucket 4 = [8,15]
    assert(got(95) == ((4L, 8L, 15L)))
    assert(got(99) == ((4L, 8L, 15L)))
  }

  test("zero values land in bucket 1 with lo pinned to 0") {
    val df = ev(("z", 0.0), ("z", 0.0), ("z", 0.0))
    val got = Relational.hdrQuantilesOf(df).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(50) == ((1L, 0L, 1L)), s"got $got")
  }

  test("negative values are filtered, not bucketed") {
    val df = ev(("n", -5.0), ("n", 1.0))
    val rows = Relational.hdrQuantilesOf(df).collect()
    assert(rows.forall(_.getLong(5) == 1L), "negative row entered n")
  }

  test("fixture: the true rank statistic lies inside the reported bucket") {
    val got = Relational.hdrQuantiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    val byType = graft.Catalog.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000.0) AS BIGINT)").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.nonEmpty)
    got.foreach { case (t, phi, lo, hi) =>
      val vs = byType(t)
      val target = (phi.toLong * vs.length + 99L) / 100L
      val trueStat = vs((target - 1L).toInt)
      assert(trueStat >= lo && trueStat <= hi,
        s"$t p$phi: rank-$target value $trueStat outside [$lo, $hi]")
    }
  }
}
