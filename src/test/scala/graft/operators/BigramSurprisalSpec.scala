package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** x17 bigram-surprisal semantics: hand-computed conditional bits, the
  * word-order sensitivity x10 cannot have, and the short-document edge.
  */
class BigramSurprisalSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand corpus: common continuation 0 bits, rare continuation 1 bit") {
    // pairs: (a,b) ×2, (a,c) ×1 → c1(a)=3
    // bits(a,b) = bitlen(3 div 2) − 1 = 0; bits(a,c) = bitlen(3) − 1 = 1
    val got = TextOps.bigramSurprisalOf(
      docs(1L -> "a b", 2L -> "a b", 3L -> "a c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 0L)) && got(2L) == ((1L, 0L)) &&
      got(3L) == ((1L, 1L)), s"got $got")
  }

  test("word order moves the score where the unigram model is blind") {
    // corpus dominated by 'the cat' transitions; one doc scrambles them.
    // Unigram x10 scores the scrambled doc identically to an in-order
    // one (same bag of tokens); x17 must not.
    val base = (1L to 8L).map(i => i -> "the cat sat")
    val corpus = docs(base :+ (9L -> "cat the sat"): _*)
    val x17 = TextOps.bigramSurprisalOf(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(x17(9L) > x17(1L),
      s"scrambled doc must out-surprise the fluent one: $x17")
    val x10 = TextOps.lmSurprisalOf(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(x10(9L) == x10(1L), "unigram control: same bag, same score")
  }

  test("docs without a transition drop; NULL text drops") {
    val got = TextOps.bigramSurprisalOf(
      docs(1L -> "solo", 2L -> null, 3L -> "two tokens"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }
}
