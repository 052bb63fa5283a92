package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** o8 binned-KS semantics: hand-computed statistics on a distribution
  * whose exact supremum falls strictly inside a bucket (the band is
  * non-vacuous), the degenerate single-value edge, and both error-bound
  * booleans across the fixture.
  */
class KsBinnedSpec extends SparkSuite {

  private def ev(rows: (String, Double, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "value", "snap")
  }
  private val inOld = col("snap") === "o"
  private val inNew = col("snap") === "n"

  test("hand case: binned strictly under exact, exact inside the band") {
    // old {0.1, 0.5}, new {0.7, 10.0}: exact sup g=4 lands between the
    // two old values INSIDE bucket 0; the binned stat sees only the
    // bucket-edge value 2
    val df = ev(("t", 0.1, "o"), ("t", 0.5, "o"),
      ("t", 0.7, "n"), ("t", 10.0, "n"))
    val r = Relational.ksBinnedOf(df, inOld, inNew).collect().head
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((2L, 4L, 4L)),
      s"got $r")
    assert(r.getBoolean(6) && r.getBoolean(7))
    assert(r.getLong(3) < r.getLong(4), "band must be non-vacuous here")
  }

  test("exact arm agrees with o4's statistic on the same flags") {
    val df = ev(("t", 0.1, "o"), ("t", 0.5, "o"),
      ("t", 0.7, "n"), ("t", 10.0, "n"))
    val o4 = Relational.ksDriftOf(df, inOld, inNew).collect().head
    assert(o4.getLong(3) == 4L, s"o4 d_num: $o4")
  }

  test("single distinct value degenerates to zero drift on both arms") {
    val df = ev(("s", 5.0, "o"), ("s", 5.0, "o"), ("s", 5.0, "n"))
    val r = Relational.ksBinnedOf(df, inOld, inNew).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getBoolean(6) && r.getBoolean(7))
  }

  test("fixture: both provable bounds hold for every type") {
    val rows = Relational.ksBinned(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"binned exceeded exact: $r")
      assert(r.getBoolean(7), s"exact outside one bucket's mass: $r")
    }
  }
}
