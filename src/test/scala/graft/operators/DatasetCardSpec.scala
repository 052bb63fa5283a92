package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** z16 dataset-card semantics: every metric hand-computed on a constructed
  * corpus, plus cross-metric consistency on the fixture.
  */
class DatasetCardSpec extends SparkSuite {

  test("hand corpus: every card metric exact") {
    // build a corpus with known duplication: docs 1,2 copies; 3 unique;
    // 4 NULL text; langs {en, de}; sources {a, b}
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    val dir = java.nio.file.Files.createTempDirectory("card").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "x y z", "en", "a", 5L),
        Row(2L, "x y z", "en", "b", 5L),
        Row(3L, "p q", "de", "a", 3L),
        Row(4L, null, null, "a", null))),
      schema).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.datasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("n_docs") == 4L)
    assert(got("n_null_text") == 1L)
    assert(got("n_tokens") == 8L)     // 3 + 3 + 2; NULL contributes none
    assert(got("n_chars") == 13L)     // 5 + 5 + 3
    assert(got("n_langs") == 2L)      // NULL lang not a language
    assert(got("n_sources") == 2L)
    assert(got("n_docs_in_dup_groups") == 2L)
    assert(got("n_dup_groups") == 1L)
    assert(got("largest_dup_group") == 2L)
    // effective: dup docs weigh 1/2 → floor(3·500000/1e6)=1 each; doc 3
    // full 2; NULL-text doc contributes nothing → 1+1+2 = 4
    assert(got("effective_tokens") == 4L)
  }

  test("fixture: cross-metric consistency") {
    val got = Pipeline.datasetCard(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Catalog.documents(spark, sfDir)
    assert(got("n_docs") == docs.count())
    assert(got("effective_tokens") <= got("n_tokens"))
    assert(got("n_docs_in_dup_groups") >= 2 * got("n_dup_groups"))
    assert(got("largest_dup_group") >= (if (got("n_dup_groups") > 0) 2L else 0L))
    assert(got("n_tokens") > 0 && got("n_langs") > 0 && got("n_sources") > 0)
  }
}
