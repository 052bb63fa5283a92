package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** n11 filtered-ANN semantics on a constructed corpus where the GLOBAL
  * nearest neighbor fails the predicate — the case that separates
  * pre-filter (returns the best ALLOWED vectors) from post-filter
  * (returns global top-k minus the disallowed, starving below k).
  */
class FilteredAnnSpec extends SparkSuite {

  // 64-dim unit-ish directions: q is the query; near ~ q; mid at an
  // angle; far orthogonal. Cosines to q strictly ordered near > mid > far.
  private def vec(main: Int, leak: Double): Seq[Float] =
    (0 until 64).map(i =>
      if (i == main) 1.0f
      else if (i == main + 1) leak.toFloat
      else 0.0f)

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-fann").toString
    import spark.implicits._
    Seq(
      (0L, vec(0, 0.0), 0),   // the one query (vec_id < NQueries)
      (10L, vec(0, 0.1), 0),  // global top-1, NOT allowed (lang en)
      (11L, vec(0, 0.8), 7),  // allowed, cos ~ 0.78
      (12L, vec(0, 2.0), 7),  // allowed, cos ~ 0.45
      (13L, vec(1, 0.0), 0))  // disallowed (fr), cos 0
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    Seq(
      (0L, "query doc", "en"), (10L, "closest but english", "en"),
      (11L, "german near", "de"), (12L, "german mid", "de"),
      (13L, "french far", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("pre-filter returns the best ALLOWED vectors, not global-top-k leftovers") {
    val got = Similarity.annFiltered(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // query 0 sees exactly the two lang=de vectors, best-first; the
    // global nearest (10) and the query itself never appear
    assert(got.toSeq == Seq((0L, 11L, 1), (0L, 12L, 2)), s"got ${got.toSeq}")
    // and the global top-1 really is the disallowed 10 — the fixture
    // exercises the starvation case, not a trivial subset
    val global = Similarity.annBruteForce(spark, corpus).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(1))
    assert(global.head == 10L, s"fixture broken: global ranking ${global.toSeq}")
  }

  test("label-predicate form matches the join form and pushes into the scan") {
    val byLabel = Similarity.annFilteredByLabel(7)(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(byLabel.toSeq == Seq((0L, 11L, 1), (0L, 12L, 2)), s"got ${byLabel.toSeq}")
    val plan = Similarity.annFilteredByLabel(7)(spark, corpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(label,7)"),
      s"label predicate not pushed to the embeddings scan:\n$plan")
  }

  test("a predicate matching nothing yields an empty result, not an error") {
    assert(Similarity.annFilteredBy(col("lang") === "xx")(spark, corpus)
      .collect().isEmpty)
  }
}
