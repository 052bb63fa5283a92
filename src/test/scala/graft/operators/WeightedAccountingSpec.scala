package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** z14: d15's weights composed into the source rollup — hand-computed
  * effective masses and inflation ratios on a constructed mirror corpus.
  */
class WeightedAccountingSpec extends SparkSuite {

  test("mirrored source shows 2x inflation; clean source shows 1x") {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "x y z", "mirror"), Row(2L, "x y z", "mirror"),
        Row(3L, "a b", "mirror"),
        Row(4L, "p q r s", "clean"))),
      schema)
    // inline the operator's body over the constructed frame (the gate
    // entry reads the fixture): weights from softDedupOf, tokens from
    // TextOps.tokens, grouped per source
    val w = Dedup.softDedupOf(docs).select(col("doc_id"), col("weight_ppm"))
    val got = docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(w, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        sum(expr("(n_tokens * weight_ppm) div 1000000L"))
          .as("effective_tokens"))
      .withColumn("dup_inflation_ppm",
        expr("(1000000L * raw_tokens) div greatest(effective_tokens, 1L)"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // mirror: docs 1+2 are copies (3 tokens at weight 500000 → 1 each),
    // doc 3 unique (2 tokens) → raw 8, effective 4, inflation 2.000000x
    assert(got("mirror") == ((3L, 8L, 4L, 2000000L)), s"got $got")
    assert(got("clean") == ((1L, 4L, 4L, 1000000L)))
  }
}
