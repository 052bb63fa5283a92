package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** d7 sub-document chunk dedup: hand-computed accounting on a corpus
  * built from explicit 10-token chunks — first occurrence is the
  * lexicographically smallest (doc_id, pos) instance of a chunk hash,
  * everything else is a duplicate, including repeats WITHIN a document
  * and instances in later documents of a chunk first seen earlier.
  */
class ChunkDedupSpec extends SparkSuite {

  // ten-token "chunks" as reusable building blocks
  private val cA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val cB = (1 to 10).map(i => s"b$i").mkString(" ")
  private val cC = (1 to 10).map(i => s"c$i").mkString(" ")

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-chunk").toString
    import spark.implicits._
    Seq(
      (1L, s"$cA $cB"), // owns A and B
      (2L, s"$cA $cC"), // A is a dup of doc 1's; owns C
      (3L, s"$cC $cC"), // both instances dup doc 2's C
      (4L, "short text under ten tokens"), // no chunks
      (5L, s"$cB plus seven trailing tokens ignored here ok")) // dup B, tail < 10 dropped
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("per-document chunk accounting matches the hand computation") {
    val got = Dedup.chunkDedup(spark, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((2L, 0L)), // first occurrences of A and B
      2L -> ((2L, 1L)), // A dups doc 1; C is new
      3L -> ((2L, 2L)), // C@pos0 dups doc 2's, C@pos1 dups too
      4L -> ((0L, 0L)), // under one chunk: present with zeros
      5L -> ((1L, 1L))), // B dups doc 1; 7-token tail has no chunk
      s"got $got")
  }

  test("accounting is invariant to input file layout (shuffle-side merge)") {
    // rewrite the same corpus as many small files; first-occurrence
    // selection must not depend on scan order
    val tmp = Files.createTempDirectory("graft-chunk-many").toString
    spark.read.parquet(s"$corpus/documents.parquet")
      .repartition(11)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val a = Dedup.chunkDedup(spark, corpus).collect().map(_.toSeq).toSet
    val b = Dedup.chunkDedup(spark, tmp).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
