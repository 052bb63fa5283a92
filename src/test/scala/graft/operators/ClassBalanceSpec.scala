package graft.operators

import graft.SparkSuite

/** c12 class-balance semantics: hand-computed Gini/majority on constructed
  * distributions, the all-NULL and single-class edges.
  */
class ClassBalanceSpec extends SparkSuite {

  import org.apache.spark.sql.functions._

  private def balanceOf(vals: Seq[Option[String]]) = {
    import spark.implicits._
    // route through the public gate entry's private core via the same
    // arithmetic: group → moments → ppm formulas
    val df = vals.toDF("v")
    val g = df.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .agg(
        coalesce(sum(when(col("v").isNotNull, col("c"))), lit(0L)).as("n"),
        coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
        coalesce(sum(when(col("v").isNotNull, 1L)), lit(0L)).as("n_classes"),
        coalesce(max(when(col("v").isNotNull, col("c"))), lit(0L)).as("maxc"),
        coalesce(sum(when(col("v").isNotNull, col("c") * col("c"))), lit(0L))
          .as("sumc2"))
      .select(col("n"), col("n_null"), col("n_classes"),
        expr("CASE WHEN n > 0 THEN (maxc * 1000000L) div n ELSE 0L END")
          .as("majority_ppm"),
        expr("CASE WHEN n > 0 THEN ((n * n - sumc2) * 1000000L) div (n * n)" +
          " ELSE 0L END").as("gini_ppm"))
    g.collect().head
  }

  test("two balanced classes: gini exactly 1/2, majority exactly 1/2") {
    val r = balanceOf(Seq(Some("a"), Some("a"), Some("b"), Some("b")))
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 2L, 500000L, 500000L)))
  }

  test("skewed 3:1 classes: gini = 1 - (9+1)/16 = 375000 ppm") {
    val r = balanceOf(Seq(Some("a"), Some("a"), Some("a"), Some("b")))
    assert((r.getLong(3), r.getLong(4)) == ((750000L, 375000L)))
  }

  test("single class is pure: gini 0, majority 1; NULLs sit outside") {
    val r = balanceOf(Seq(Some("a"), Some("a"), None))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 1L, 1L, 1000000L, 0L)))
  }

  test("all NULL: zero-filled, no division blowup") {
    val r = balanceOf(Seq(None, None))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((0L, 2L, 0L, 0L, 0L)))
  }

  test("fixture gate entry: three columns, all diagnostics in range") {
    val rows = Profile.classBalance(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("documents.lang", "documents.source", "events.event_type"))
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert(r.getLong(5) >= 0L && r.getLong(5) < 1000000L)
      // majority share can never be below 1/n_classes
      assert(r.getLong(4) * r.getLong(3) >= 1000000L - r.getLong(3))
    }
  }
}
