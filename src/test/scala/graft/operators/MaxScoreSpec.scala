package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** b15 MaxScore pruning: lossless vs the exact scorer BY CONSTRUCTION, and
  * the prune must be real (the stopword-frequency posting list stays out of
  * the candidate set) — plus the no-certified-floor fallback.
  */
class MaxScoreSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** 5 docs carry the rare strong term; 200 carry only the stopword. */
  private def skewedCorpus(): DataFrame = docs(
    (1L to 5L).map(i =>
      i -> s"zebra quality document $i with noise and unique tok$i words") ++
      (6L to 205L).map(i => i -> "noise filler filler filler"): _*)

  private val Terms = Seq("zebra", "noise")

  test("pruned top-k equals the exact scorer on the skewed corpus") {
    val exact = Search.bm25Of(skewedCorpus(), Terms, 2).collect().toSeq
    val pruned = Search.bm25MaxScoreOf(skewedCorpus(), Terms, 2).collect().toSeq
    assert(pruned == exact, s"pruned $pruned vs exact $exact")
  }

  test("the stopword posting list never enters the candidate set") {
    // rebuild the tf relation the operator sees, then ask for candidates
    val dl = skewedCorpus()
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
    val tf = dl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).as("t"))
    val cands = Search.maxscoreCandidates(tf, stats, 2)
      .collect().map(_.getLong(0)).toSet
    // only the 5 zebra docs are essential-term matches; the 200
    // stopword-only docs are certified out by the θ floor
    assert(cands == (1L to 5L).toSet, s"candidates $cands")
  }

  test("fewer than k seed docs: no certified floor, falls back to exact") {
    val tiny = docs(
      1L -> "zebra alpha", 2L -> "noise beta", 3L -> "noise zebra gamma")
    val exact = Search.bm25Of(tiny, Terms, 5).collect().toSeq
    val pruned = Search.bm25MaxScoreOf(tiny, Terms, 5).collect().toSeq
    assert(pruned == exact)
  }

  test("all-stopword query (every upper bound zero) stays exact") {
    val flat = docs((1L to 30L).map(i => i -> "noise common words"): _*)
    val exact = Search.bm25Of(flat, Seq("noise", "common"), 3).collect().toSeq
    val pruned = Search.bm25MaxScoreOf(flat, Seq("noise", "common"), 3)
      .collect().toSeq
    assert(pruned == exact)
  }

  test("fixture: b15 off the persisted index equals b2 exactly") {
    val b2 = Search.bm25Indexed(spark, sfDir).collect().toSeq
    val b15 = Search.bm25MaxScore(spark, sfDir).collect().toSeq
    assert(b15 == b2)
  }
}
