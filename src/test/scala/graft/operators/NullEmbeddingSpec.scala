package graft.operators

import java.nio.file.Files

import graft.SparkSuite

/** NULL/zero-embedding semantics, pinned (the similarity-side sibling of
  * NullTextSpec): the fixtures carry no NULL embeddings, so the engines'
  * agreement on them is untested by the gate. The documented contract —
  * direction-less vectors (zero-norm AND NULL) are excluded from pair
  * MINING and similarity search but are NOT duplicates of anything, so
  * dedup keeps them — must hold on both engines: Spark's null-intolerant
  * `dot_product` and DuckDB's `list_inner_product(NULL) > 0` both drop
  * NULL rows from `nonZeroEmbeddings`/`nz`, and both dedup views keep
  * them through the loser anti-join.
  */
class NullEmbeddingSpec extends SparkSuite {

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-nullemb").toString
    import spark.implicits._
    val unit = Seq.fill(64)(0.1f)
    Seq(
      (1L, Option(unit), 0),
      (2L, Option(unit), 0), // exact duplicate direction of 1 → z2 loser
      (3L, Option(Seq.fill(64)(0.0f)), 1), // zero vector: no direction
      (4L, Option.empty[Seq[Float]], 1), // THE NULL embedding
      (5L, Option((1 to 64).map(i => ((i % 7) - 3) * 0.1f)), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("NULL and zero embeddings are excluded from similarity search") {
    val n1 = Similarity.annBruteForce(spark, corpus).collect()
    val ids = n1.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(3L) && !ids.contains(4L),
      s"direction-less vectors must appear in no candidate or query, got $ids")
    assert(ids.contains(1L) && ids.contains(2L) && ids.contains(5L))
  }

  test("n6 quantization drops NULL embeddings, keeps zero vectors as all-zero") {
    val rows = Similarity.quantizeInt8(spark, corpus).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L),
      "NULL embedding (4) has no quantized form; everything else is kept")
    val zero = rows.find(_.getLong(0) == 3L).get
    // scale_r, q_sum, q_l1, n_zero_dims
    assert(zero.getDouble(1) == 0.0 && zero.getLong(2) == 0L &&
      zero.getLong(3) == 0L && zero.getLong(4) == 64L)
    // unit vector 0.1 in every dim: every q_i = 127
    val unit = rows.find(_.getLong(0) == 1L).get
    assert(unit.getLong(2) == 127L * 64 && unit.getLong(4) == 0L)
  }

  test("z2 dedup keeps NULL and zero embeddings (not duplicates of anything)") {
    val kept = Pipeline.embeddingDedup(spark, corpus).collect()
      .map(_.getLong(0)).toSet
    assert(kept.contains(3L) && kept.contains(4L),
      "direction-less vectors must survive dedup — they are excluded " +
        "from mining, not dropped from the corpus")
    assert(kept.contains(1L) && !kept.contains(2L),
      "the larger id of an identical-direction pair must be the loser")
    assert(kept.contains(5L))
  }
}
