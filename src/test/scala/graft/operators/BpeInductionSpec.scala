package graft.operators

import graft.SparkSuite

/** x18 iterated BPE induction: the properties that distinguish a merge
  * LOOP from one static round — greedy left-to-right merging, and
  * round-2 selections that do not exist in round 1's table.
  */
class BpeInductionSpec extends SparkSuite {

  private val J = "\u0002" // the merged-symbol joiner

  private def merges(text: String, rounds: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    TextOps.bpeInductionOf(Seq((1L, text)).toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("greedy left-to-right: 'a a a' merges the LEFT pair only") {
    // round 1: (a,a) appears twice but only ONE merge fires (the match
    // consumes the middle symbol); round 2 must see [a·a, a], proving
    // the left pair won — a right-pair merge would put 'a' first
    assert(merges("a a a", 2) === Seq(
      (1, "a", "a", 2L),
      (2, "a" + J + "a", "a", 1L)))
  }

  test("the loop is order-sensitive: round 2's winner does not exist in " +
      "round 1's pair table") {
    // tokens x y x y y x y — round 1: (x,y)=3 beats (y,x)=2, (y,y)=1.
    // After merging all three (x y) occurrences the corpus is
    // [x·y, x·y, y, x·y]: (y,x) — round 1's SECOND place — now has
    // count 0, and the winner (x·y, x·y) was not a round-1 pair at all.
    // A static top-2 of x12's table would have selected (y,x).
    val got = merges("x y x y y x y", 2)
    assert(got.head === ((1, "x", "y", 3L)))
    val xy = "x" + J + "y"
    assert(got(1) === ((2, xy, xy, 1L)),
      s"round 2 must select among post-merge symbols: ${got(1)}")
  }

  test("merged symbols cannot collide with literal tokens ('a'+'b' vs 'ab')") {
    // 'a b ab ab': round 1 ties at n=1, tie-break picks (a, b); the
    // merged a·b carries the joiner so it remains distinct from the
    // literal token 'ab' in round 2's table
    val got = merges("a b ab ab", 2)
    assert(got.head === ((1, "a", "b", 1L)))
    // round 2 table: (a·b, ab)=1 and (ab, ab)=1 — two DISTINCT t1
    // symbols, which is the whole point; tie-break picks a·b (the
    // joiner byte sorts below 'b')
    assert(got(1) === ((2, "a" + J + "b", "ab", 1L)),
      s"merged a·b must stay distinct from literal 'ab': ${got(1)}")
  }

  test("exhaustion stops the loop early instead of failing") {
    // a single-token corpus has no pairs at all
    assert(merges("lonely", 3).isEmpty)
    // one pair, then nothing mergeable at the requested depth beyond it
    val got = merges("p q", 5)
    assert(got === Seq((1, "p", "q", 1L)))
  }

  private def encode(rounds: Int, docs: (Long, String)*): Map[Long, (Int, Int, Int)] = {
    import spark.implicits._
    TextOps.bpeEncodeOf(docs.toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
  }

  test("x19 encode: per-document compression accounting on a hand corpus") {
    // "x y x y y x y": round 1 applies (x,y) three times (7 -> 4
    // symbols), round 2 merges the first (x·y, x·y) pair (4 -> 3)
    assert(encode(2, 1L -> "x y x y y x y") ===
      Map(1L -> ((7, 3, 4))))
  }

  test("x19 encode: documents sharing no selected pair stay unencoded") {
    // doc 1 drives both rounds' winners ((a,b) then (a·b, a·b)); doc 2's
    // only pair (q,r) never wins at depth 2, so it passes through intact
    val got = encode(2, 1L -> "a b a b a b", 2L -> "q r")
    assert(got(1L) === ((6, 2, 4)))
    assert(got(2L) === ((2, 2, 0)), s"untouched doc must not compress: $got")
  }

  test("x19 encode survives merge exhaustion: rounds beyond the last " +
      "viable merge are no-ops, not row loss") {
    // round-12 review finding: the oracle's original `FROM r_i, w_i`
    // cross join DROPPED every document once a round's winner CTE came
    // up empty (verified against DuckDB on this exact corpus); the
    // chain now LEFT-joins the winner so an exhausted round passes the
    // corpus through unchanged — matching this early-stop behavior
    assert(encode(4, 1L -> "a b", 2L -> "a b") ===
      Map(1L -> ((2, 1, 1)), 2L -> ((2, 1, 1))))
  }

  test("x19 encode reconciles with x18's selection counts on the fixture") {
    // greedy overlap can apply FEWER merges than the selection-time pair
    // count ('a a a' counts (a,a)=2 but merges once), never more
    val applied = TextOps.bpeEncode(spark, sfDir).collect()
      .map(_.getInt(3).toLong).sum
    val selected = TextOps.bpeInduction(spark, sfDir).collect()
      .map(_.getLong(3)).sum
    assert(applied > 0L, "fixture encode must apply some merges")
    assert(applied <= selected,
      s"applied merges $applied cannot exceed selection-time counts $selected")
  }

  test("reserved delimiter bytes in corpus text fail LOUDLY at render " +
      "(r12 ADVICE: silent identical corruption in both engines)") {
    // a token carrying chr(1) would forge symbol boundaries; chr(2) would
    // impersonate a merged symbol — either must raise, not mis-merge
    Seq("evil\u0001token", "evil\u0002token").foreach { bad =>
      val e = intercept[Exception](merges(s"a b $bad", 1))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("reserved delimiter byte")),
        s"wrong failure for $bad: $e")
    }
    // encode renders through the same guard
    val e2 = intercept[Exception](encode(1, 1L -> "a b c\u0001d"))
    assert(e2.toString.contains("reserved delimiter byte") ||
      Option(e2.getCause).exists(_.toString.contains("reserved delimiter byte")))
  }

  test("fixture run matches the gate shape: exactly BpeMergeRounds rows, " +
      "counts non-increasing is NOT required but ranks are dense") {
    val got = TextOps.bpeInduction(spark, sfDir).collect()
    assert(got.length === TextOps.BpeMergeRounds)
    assert(got.map(_.getInt(0)).toSeq === (1 to TextOps.BpeMergeRounds))
    got.foreach(r => assert(r.getLong(3) >= 1L))
  }
}
