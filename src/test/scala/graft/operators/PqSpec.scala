package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** n9 product quantization: encode determinism, code-range/byte-budget
  * invariants, lossless round-trip on codeword-exact vectors, and the
  * gate query's accounting shape.
  */
class PqSpec extends SparkSuite {

  import spark.implicits._

  test("codes are in [0, Ks) and one per subspace") {
    val codes = graft.Catalog.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .select(array(Similarity.pqCodeCols(col("embedding")): _*).as("cs"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    assert(codes.forall(_.length == Similarity.PqM))
    assert(codes.forall(_.forall(c => c >= 0 && c < Similarity.PqKs)))
  }

  test("a codeword-exact vector round-trips losslessly through PQ") {
    // build vectors that ARE concatenations of chosen codewords — the
    // quantizer must select exactly those codes (argmax of a vector
    // against its own codebook entry is itself)
    val chosen = Seq(
      Seq(0, 5, 15, 3, 7, 1, 9, 12),
      Seq(2, 2, 2, 2, 2, 2, 2, 2))
    val vecs = chosen.map(cs =>
      cs.zipWithIndex.flatMap { case (k, m) => Similarity.pqCodebooks(m)(k) })
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = df
      .select(col("vec_id"), array(Similarity.pqCodeCols(col("embedding")): _*).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(0L) == chosen(0) && got(1L) == chosen(1))
  }

  test("encoding is deterministic across partitionings") {
    val e = graft.Catalog.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
    def codesAt(parts: Int) = e.repartition(parts)
      .select(col("vec_id"), array(Similarity.pqCodeCols(col("embedding")): _*).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codesAt(1) == codesAt(8))
  }

  test("gate accounting: one row per query, hits <= expected, recall exact") {
    val rows = Similarity.pqAdcRecall(spark, sfDir).collect()
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      val (exp, hits, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(exp == Similarity.TopK && hits >= 0 && hits <= exp)
      assert(math.abs(rec - hits.toDouble / exp) < 1e-9)
    }
  }
}
