package graft.operators

import graft.SparkSuite

/** n7 structural contract (value exactness is the oracle gate's job):
  * one row per approximate method, n_expected equal to the exact
  * baseline's pair count for every method, hits bounded by expected, and
  * recall exactly the rounded hits/expected ratio.
  */
class AnnRecallSpec extends SparkSuite {

  test("n7 rows are per-method accountings against the same exact baseline") {
    val nExact = Similarity.annBruteForce(spark, sfDir).count()
    val rows = Similarity.annRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("n3_lsh", "n4_ivf", "n5_ivf_kmeans"))
    rows.foreach { r =>
      val (exp, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(exp == nExact, s"${r.getString(0)}: expected-pair count drifted")
      assert(hits >= 0L && hits <= exp)
      assert(recall == BigDecimal(hits.toDouble / exp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
