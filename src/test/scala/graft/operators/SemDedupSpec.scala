package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** d14 SemDeDup semantics: the pair set is exactly "exact cosine ≥ t AND
  * same fitted-k-means cluster" (the deterministic restriction that makes
  * the work Σ|c|² instead of all-pairs), the keeper rule is greedy
  * keep-smallest, and reruns are bit-identical.
  */
class SemDedupSpec extends SparkSuite {

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("d14 verdicts equal the brute-force same-cluster rule; greedy keeper law holds") {
    val got = Similarity.semDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.nonEmpty)

    // in-spec brute force: same assignment (read from the result), exact
    // cosine over the raw embeddings, within-cluster restriction
    val embs = Similarity.nonZeroEmbeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(embs.keySet === got.keySet, "one verdict per non-zero vector")
    val ids = embs.keys.toSeq.sorted
    val pairs = for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      if got(a)._1 == got(b)._1                      // same cluster
      if cosine(embs(a), embs(b)) >= Similarity.SemThreshold
    } yield (a, b)
    assert(pairs.nonEmpty, "fixture must contain same-cluster dup pairs")

    // greedy keep-smallest: dropped ⇔ appears as the larger side of a pair
    val losers = pairs.map(_._2).toSet
    got.foreach { case (id, (_, keeper)) =>
      assert(keeper == !losers.contains(id),
        s"vec $id: keeper=$keeper but losers=${losers.contains(id)}")
    }

    // the restriction is the documented trade: brute pairs WITHOUT the
    // cluster restriction must be a strict superset on this fixture (a
    // cross-cluster near-dup exists), or the spec proves nothing about
    // what SemDeDup gives up
    val allPairs = for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      if cosine(embs(a), embs(b)) >= Similarity.SemThreshold
    } yield (a, b)
    assert(allPairs.size > pairs.size,
      "fixture has no cross-cluster near-dup — the cluster restriction is vacuous here")
  }

  test("d14 is deterministic across reruns") {
    val r1 = Similarity.semDedup(spark, sfDir).collect().toSeq
    val r2 = Similarity.semDedup(spark, sfDir).collect().toSeq
    assert(r1 === r2)
  }
}
