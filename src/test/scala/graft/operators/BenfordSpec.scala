package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** c13 Benford-profile semantics: digit extraction without log10, the
  * ppm arithmetic, and the non-positive / sub-resolution edges.
  */
class BenfordSpec extends SparkSuite {

  private def vals(vs: Double*) = {
    import spark.implicits._
    vs.toDF("v")
  }

  test("digits come from micro-units across magnitudes; ppm exact") {
    // leading digits: 1 (0.0123), 9 (9.0), 1 (123.4), 4 (0.45) → d1 ×2 of 4
    val got = Profile.benfordOf(vals(0.0123, 9.0, 123.4, 0.45), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got("1") == ((2L, 500000L, 500000L - 301029L)), s"got $got")
    assert(got("4") == ((1L, 250000L, math.abs(250000L - 96910L))))
    assert(got("9") == ((1L, 250000L, 250000L - 45757L)))
    assert(!got.contains("2"))
  }

  test("non-positive values and sub-resolution values drop") {
    val got = Profile.benfordOf(
      vals(-5.0, 0.0, 0.0000001, 2.0), col("v")).collect()
    // only 2.0 survives: negatives/zero filtered, 1e-7 is below the
    // micro resolution (digit '0' has no expectation row)
    assert(got.length == 1 && got.head.getString(0) == "2")
    assert(got.head.getLong(2) == 1000000L)
  }

  test("fixture: all nine digits present, shares sum to ~1e6") {
    val rows = Profile.benfordProfile(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    val total = rows.map(_.getLong(2)).sum
    assert(total >= 999991L && total <= 1000000L, s"ppm sum $total")
  }
}
