package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** x14 RAG chunk materialization: window/stride coverage semantics on
  * hand-built documents — exact chunk counts, positional alignment,
  * final-chunk truncation, full token coverage, and NULL exclusion.
  */
class RagChunkSpec extends SparkSuite {

  import spark.implicits._

  private def doc(id: Long, n: Int): (Long, String) =
    id -> (1 to n).map(i => s"t$i").mkString(" ")

  private def chunksFor(docs: Seq[(Long, String)],
      window: Int = TextOps.RagChunkTokens,
      stride: Int = TextOps.RagChunkStride) =
    TextOps.ragChunksOf(
      docs.toDF("doc_id", "text"), window, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(r => (r._1, r._2))

  test("chunk counts: <=window is one chunk, window+1 spills, exact ceil") {
    // window 32 / stride 24: n=32 -> 1 chunk; n=33 -> 2; n=56 -> 2;
    // n=57 -> ceil(25/24)+1 = 3
    val out = chunksFor(Seq(doc(1, 32), doc(2, 33), doc(3, 56), doc(4, 57)))
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3), s"got $out")
  }

  test("positions, truncation, and overlap are exact") {
    val rows = chunksFor(Seq(doc(7, 40)))
    // chunk 0: tokens 1..32 at offset 0; chunk 1: tokens 25..40 (16 toks)
    assert(rows.length == 2)
    assert(rows(0) == ((7L, 0L, 0L, 32L, (1 to 32).map(i => s"t$i").mkString(" "))))
    assert(rows(1) == ((7L, 1L, 24L, 16L, (25 to 40).map(i => s"t$i").mkString(" "))))
  }

  test("every token is covered by at least one chunk, at any length") {
    for (n <- Seq(1, 24, 31, 32, 33, 48, 49, 99, 100)) {
      val rows = chunksFor(Seq(doc(1, n)))
      val covered = rows.flatMap { case (_, _, start, len, _) =>
        start until (start + len)
      }.toSet
      assert(covered == (0L until n.toLong).toSet,
        s"n=$n: coverage hole — got ${covered.size} of $n")
      // and the final chunk ends exactly at the document end
      val last = rows.last
      assert(last._3 + last._4 == n.toLong, s"n=$n: last chunk overruns")
    }
  }

  test("NULL text is excluded; custom window/stride validated") {
    val rows = TextOps.ragChunksOf(
      Seq((1L, Option("alpha beta")), (2L, Option.empty[String]))
        .toDF("doc_id", "text")).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    intercept[IllegalArgumentException] {
      TextOps.ragChunksOf(Seq((1L, "x")).toDF("doc_id", "text"),
        window = 8, stride = 9)
    }
  }

  test("gate query at sf0.01: rows reconcile with per-doc token counts") {
    val perDoc = TextOps.ragChunks(spark, sfDir)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = TextOps.RagChunkTokens
    val s = TextOps.RagChunkStride
    val toks = graft.Catalog.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(perDoc.keySet == toks.keySet)
    toks.foreach { case (id, n) =>
      val expected = if (n <= w) 1L else ((n - w + s - 1) / s + 1).toLong
      assert(perDoc(id) == expected, s"doc $id: $n tokens")
    }
  }
}
