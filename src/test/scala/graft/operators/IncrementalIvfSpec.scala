package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** n12 incremental IVF maintenance: the frozen-quantizer equivalence
  * (maintained lists serve exactly what a full rebuild serves), the
  * artifact's delta-free content (the O(delta) evidence), and artifact
  * reuse across calls.
  */
class IncrementalIvfSpec extends SparkSuite {

  test("serving off the maintained lists equals the full n4 rebuild exactly") {
    val inc = Similarity.annIvfIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val full = Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(inc.nonEmpty)
    assert(inc.toSeq == full.toSeq,
      "frozen quantizer: maintained view must serve the rebuild's rows")
  }

  test("the persisted artifact holds the existing corpus only — never the delta") {
    val lists = Similarity.ivfListsIndexed(spark, sfDir)
    val ids = lists.select(col("vec_id")).collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(!ids.exists(_ % Similarity.IvfDeltaMod == 0),
      "delta vectors in the persisted lists would mean maintenance re-ran the corpus")
    // and it covers EVERY existing non-zero vector exactly once
    val expected = Similarity.nonZeroEmbeddings(spark, sfDir)
      .filter(col("vec_id") % Similarity.IvfDeltaMod =!= 0).count()
    assert(ids.length.toLong == expected)
    assert(ids.distinct.length == ids.length)
  }

  test("n13 drift accounting reconciles with the maintained view's own masses") {
    val row = Similarity.ivfDrift(spark, sfDir).collect().head
    val existing = Similarity.ivfListsIndexed(spark, sfDir).count()
    val delta = Similarity.nonZeroEmbeddings(spark, sfDir)
      .filter(col("vec_id") % Similarity.IvfDeltaMod === 0).count()
    assert(row.getLong(0) == existing + delta,
      "chi-square mass must equal the maintained view's row count")
    assert(row.getLong(2) == 2L, "epochs: existing + delta")
    assert(row.getLong(3) == (row.getLong(1) - 1L) * 1L, "dof = (n_x-1)(n_y-1)")
    assert(row.getLong(4) >= 0L)
  }

  test("the artifact is reused, not rebuilt, on a second call") {
    val a = Similarity.ivfListsIndexed(spark, sfDir)
      .select(col("vec_id"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = Similarity.ivfListsIndexed(spark, sfDir)
      .select(col("vec_id"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b)
  }
}
