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

  test("n14 IVF-PQ composes both compressions: recall <= each single stage's, " +
    "never vacuously zero or one across the battery") {
    def recallOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivfpq = recallOf(Similarity.ivfPqRecall(spark, sfDir))
    assert(ivfpq.size == Similarity.NQueries)
    // IVF-PQ's candidate set is n4's (same probes) and its ranking is
    // n9's (same codes) — so per query it can never recall MORE than the
    // probing stage alone (quantization only reorders the probed set;
    // the PQ-only comparison is not per-query monotone because its
    // candidate pool is the whole corpus, so only the probe bound holds)
    val ivfRows = Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val brute = Similarity.annBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    ivfpq.foreach { case (q, hits) =>
      val probeRecallBound = (ivfRows(q) & brute(q)).size
      assert(hits <= probeRecallBound,
        s"query $q: IVF-PQ hits $hits exceed the probing stage's $probeRecallBound")
    }
    // non-vacuity: the battery must separate — something is lost to the
    // two compressions and something survives them
    assert(ivfpq.values.sum > 0, "IVF-PQ recalled nothing — broken compose")
    assert(ivfpq.values.sum < Similarity.NQueries * Similarity.TopK,
      "IVF-PQ recalled everything — the fixture exercises no loss")
  }

  test("n15 refine: never worse than ADC at the same k, bounded by L and k") {
    val rows = Similarity.pqRerankRecall(spark, sfDir).collect()
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r.getLong(1) == Similarity.TopK)
      // the structural claim (refined hits = |shortlist ∩ brute top-k| ⊇
      // |ADC top-k ∩ brute top-k| since ADC's top-k ⊆ the shortlist and
      // brute's own comparator orders the exact re-rank)
      assert(r.getBoolean(5), s"refine did worse than ADC: $r")
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(3) <= r.getLong(1))
      assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / r.getLong(1)) < 1e-9)
    }
    // the refine stage must be able to help on SOME fixture query, else
    // the L-vs-k dial is vacuous here — allow equality only if raw ADC
    // was already perfect everywhere
    val anyImprovement = rows.exists(r => r.getLong(3) > r.getLong(2))
    val adcPerfect = rows.forall(r => r.getLong(2) == r.getLong(1))
    assert(anyImprovement || adcPerfect,
      "refine never improved on ADC and ADC was not perfect — dial vacuous")
  }
}
