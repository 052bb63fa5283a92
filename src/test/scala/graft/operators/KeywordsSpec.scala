package graft.operators

import graft.SparkSuite

/** x20 TF-IDF keywords: hand-computed integer-bits scoring, the
  * arithmetic stopword drop, tie-breaks, and fixture sanity.
  */
class KeywordsSpec extends SparkSuite {

  test("hand corpus: scores, ranks, and the df>N/2 stopword drop") {
    import spark.implicits._
    // N=5; df: apple 1, banana 2, cherry 1, kiwi 1, plum 1, the 4, x 1, y 1
    // idf_bits: df=1 -> floor(log2(5))=2; df=2 -> floor(log2(2))=1;
    // df=4 -> floor(log2(5 div 4))=0 -> 'the' drops everywhere
    val docs = Seq(
      (1L, "apple apple banana the"),
      (2L, "banana cherry the"),
      (3L, "the kiwi"),
      (4L, "the plum plum plum"),
      (5L, "x y"))
      .toDF("doc_id", "text")
    val got = TextOps.keywordsOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got((1L, 1)) === (("apple", 2L, 2L, 4L)))
    assert(got((1L, 2)) === (("banana", 1L, 1L, 1L)))
    assert(got((2L, 1)) === (("cherry", 1L, 2L, 2L)))
    assert(got((2L, 2)) === (("banana", 1L, 1L, 1L)))
    assert(got((3L, 1)) === (("kiwi", 1L, 2L, 2L)))
    assert(got((4L, 1)) === (("plum", 3L, 2L, 6L)))
    // equal scores break ties by token ascending — total order
    assert(got((5L, 1)) === (("x", 1L, 2L, 2L)))
    assert(got((5L, 2)) === (("y", 1L, 2L, 2L)))
    // 'the' (df=4 > N/2) must never surface
    assert(!got.values.exists(_._1 == "the"), "stopword must quantize out")
    assert(got.size === 8)
  }

  test("a doc whose every token is corpus-hot emits no keywords") {
    import spark.implicits._
    // both tokens appear in > half the docs -> idf_bits 0 -> no rows for
    // doc 3; rare terms in docs 1/2 still surface
    val docs = Seq(
      (1L, "common words rare1"),
      (2L, "common words rare2"),
      (3L, "common words"))
      .toDF("doc_id", "text")
    val got = TextOps.keywordsOf(docs).collect()
    assert(!got.exists(_.getLong(0) == 3L),
      "all-hot doc must produce zero keyword rows, not zero-score rows")
    assert(got.map(r => (r.getLong(0), r.getString(2))).toSet ===
      Set((1L, "rare1"), (2L, "rare2")))
  }

  test("fixture: at most K rows per doc, ranks dense, scores positive " +
      "and non-increasing within a doc") {
    val rows = TextOps.keywords(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= TextOps.KeywordTopK)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length),
        s"doc $doc ranks not dense")
      assert(sorted.forall(_._3 > 0L))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse ===
        sorted.map(_._3).toSeq, s"doc $doc scores not non-increasing")
    }
  }
}
