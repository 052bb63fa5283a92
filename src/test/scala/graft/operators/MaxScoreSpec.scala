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

  test("fixture: b15 off the persisted index + metadata equals b2 exactly") {
    val b2 = Search.bm25Indexed(spark, sfDir).collect().toSeq
    val b15 = Search.bm25MaxScore(spark, sfDir).collect().toSeq
    assert(b15 == b2)
  }

  test("gate plan carries no df window: per-term bounds come from metadata") {
    // the ad-hoc form pays a Window (df over tok — a shuffle of posting
    // rows); the indexed gate entry must not: df and ub are pushed
    // metadata-row joins, so nothing moves before the candidate-sized
    // aggregation
    val plan = Search.bm25MaxScore(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"df window leaked into the plan:\n$plan")
    // and the query terms reach BOTH artifact scans as pushed In filters
    // (postings: b2's property; metadata: the reason it is tok-sorted)
    assert(plan.contains("PushedFilters: [In(tok"),
      s"tok IN (…) not pushed to the artifact scans:\n$plan")
  }

  test("metadata artifact agrees with the window-df derivation") {
    import spark.implicits._
    val meta = Search.maxscoreMeta(spark, sfDir)
      .filter(col("tok").isin(Search.QueryTerms: _*))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // recompute df/ub from the raw postings with the window form
    val postings = Search.postingsIndex(spark, sfDir)
      .filter(col("tok").isin(Search.QueryTerms: _*))
    val stats = Search.statsIndex(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    val expected = postings
      .withColumn("df", count(lit(1)).over(w))
      .crossJoin(broadcast(stats))
      .withColumn("ppm", expr(
        "CAST(round(CAST((length(bin((2*n + 2) div (2*df + 1))) - 1)" +
          " * 22 * tf * t AS DOUBLE) / CAST(10*tf*t + 3*t + 9*dl*n AS DOUBLE)" +
          " * 1000000.0, 0) AS BIGINT)"))
      .groupBy(col("tok"))
      .agg(max(col("df")).as("df"), max(col("ppm")).as("ub"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(meta == expected)
  }
}
