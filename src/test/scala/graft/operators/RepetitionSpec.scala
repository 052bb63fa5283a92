package graft.operators

import java.nio.file.Files

import graft.SparkSuite

/** x8 repetition-signal semantics on hand-computed fixtures — the kernel
  * runs through the full codegen'd query path (not a direct kernel call),
  * so the Expression's doGenCode is exercised too.
  */
class RepetitionSpec extends SparkSuite {

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-rep").toString
    import spark.implicits._
    Seq(
      // "go go go go": 4 tokens, 1 distinct; bigrams = 3x "go go"
      (1L, Option("go go go go")),
      // all-distinct: 4 tokens, 3 distinct bigrams, each once
      (2L, Option("one two three four")),
      // single token: zero bigrams -> top_bigram_frac NULL
      (3L, Option("solo")),
      // repeated bigram inside varied text: "ha ha" occurs twice
      (4L, Option("ha ha x ha ha")),
      (5L, Option.empty[String])) // NULL text -> NULL measures
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("x8 matches hand-computed repetition signals") {
    val out = TextOps.repetitionScores(spark, corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getInt(1) == 4 && d1.getDouble(2) == 0.75 &&
      d1.getInt(3) == 1 && d1.getDouble(4) == 1.0,
      s"stutter doc: got $d1")
    val d2 = out(2L)
    assert(d2.getInt(1) == 4 && d2.getDouble(2) == 0.0 &&
      d2.getInt(3) == 3 && d2.getDouble(4) == 0.333333,
      s"distinct doc: got $d2")
    val d3 = out(3L)
    assert(d3.getInt(1) == 1 && d3.getDouble(2) == 0.0 &&
      d3.getInt(3) == 0 && d3.isNullAt(4),
      s"single-token doc must have NULL top_bigram_frac: got $d3")
    val d4 = out(4L)
    // tokens: ha ha x ha ha -> 5 tokens, 2 distinct; bigrams: (ha ha) x2,
    // (ha x), (x ha) -> 3 distinct of 4, top = 2
    assert(d4.getInt(1) == 5 && d4.getDouble(2) == 0.6 &&
      d4.getInt(3) == 3 && d4.getDouble(4) == 0.5,
      s"mixed doc: got $d4")
    val d5 = out(5L)
    assert(d5.isNullAt(1) && d5.isNullAt(2) && d5.isNullAt(3) && d5.isNullAt(4),
      s"NULL text must yield NULL repetition measures: got $d5")
  }
}
