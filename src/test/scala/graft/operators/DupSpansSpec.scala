package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.HashFunctions.window_hash60

/** d8 exact substring-duplication detection: hand-computed window
  * accounting on a corpus with a known 9-token shared substring, a doc
  * whose only repetition is INTERNAL (must NOT count — d8 is cross-doc),
  * an all-unique doc, a sub-window doc, and a NULL-text doc.
  */
class DupSpansSpec extends SparkSuite {

  private val k = Dedup.SpanTokens // 8

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-spans").toString
    import spark.implicits._
    val t = (1 to 10).map(i => s"t$i") // shared material
    Seq(
      (1L, t.mkString(" ")),                          // t1..t10: 3 windows
      (2L, ("x" +: t.take(9) :+ "y").mkString(" ")),  // shares t1..t9 with doc 1
      (3L, "short text"),                             // < k tokens: no windows
      (4L, (1 to 20).map(i => s"u$i").mkString(" ")), // unique: 13 windows, 0 dup
      (5L, ((1 to 8) ++ (1 to 8)).map(i => s"r$i").mkString(" ")), // internal repeat only
      (6L, null.asInstanceOf[String]))                // NULL text
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("window accounting and longest duplicated span match the hand computation") {
    val got = Dedup.dupSpans(spark, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: windows t1..t8, t2..t9, t3..t10; the first two also occur in
    // doc 2 → run of 2 consecutive dup windows = span 2 + k - 1 = 9 tokens
    // (exactly the shared substring t1..t9)
    assert(got(1L) == ((3L, 2L, 9L)))
    // doc 2: 4 windows (x t1..t7 | t1..t8 | t2..t9 | t3..t9 y); middle two dup
    assert(got(2L) == ((4L, 2L, 9L)))
    // doc 3: under k tokens — no windows at all
    assert(got(3L) == ((0L, 0L, 0L)))
    // doc 4: all windows unique corpus-wide
    assert(got(4L) == ((13L, 0L, 0L)))
    // doc 5: r1..r8 repeats INSIDE the doc (window 0 == window 8) but in no
    // other doc — cross-doc dup accounting must stay zero
    assert(got(5L) == ((9L, 0L, 0L)))
    // doc 6: NULL text behaves like an empty doc (left-join zeros)
    assert(got(6L) == ((0L, 0L, 0L)))
  }

  test("window_hash60 is positional: distinct set equals the shingle set, index = position") {
    import spark.implicits._
    val df = Seq("one two three four five").toDF("text")
      .select(window_hash60(col("text"), 2).as("w"),
        graft.expressions.HashFunctions.shingle_hash60(col("text"), 2).as("s"))
    val row = df.collect().head
    val w = row.getSeq[Long](0)
    val s = row.getSeq[Long](1)
    assert(w.length == 4)           // 5 tokens, k=2 → 4 positions
    assert(w.distinct.sorted == s.sorted) // same hash family as the shingle kernel
    // position alignment: hash at index 1 is the "two three" shingle —
    // recompute it via the 1-window text
    val one = Seq("two three").toDF("text")
      .select(window_hash60(col("text"), 2).as("w")).collect().head.getSeq[Long](0)
    assert(one.length == 1 && w(1) == one.head)
  }

  test("window_hash60 edge shapes: repeats kept, short text empty, NULL null") {
    import spark.implicits._
    val rows = Seq(
      ("a b a b a b", 2),  // overlapping repeats must all be kept
      ("only", 2),         // fewer tokens than k
      (null.asInstanceOf[String], 2))
      .toDF("text", "kk")
      .select(window_hash60(col("text"), 2).as("w"))
      .collect()
    val rep = rows(0).getSeq[Long](0)
    assert(rep.length == 5 && rep(0) == rep(2) && rep(2) == rep(4)
      && rep(1) == rep(3) && rep(0) != rep(1))
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }
}
