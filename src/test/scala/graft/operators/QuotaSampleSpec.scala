package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** z8 quota sampling and its bounded-threshold primitive: the kept set
  * must equal the window formulation (`row_number() OVER (PARTITION BY
  * lang ORDER BY qk, doc_id) <= quota`) on every input — the operator's
  * whole point is computing that set WITHOUT shuffling the corpus, so the
  * equivalence is the contract. Also pins: sub-quota strata keep all
  * their rows, results are invariant to input file layout (exercises the
  * heap MERGE path across many input splits), and the final plan really
  * is threshold-broadcast (no sort-based window over the data rows).
  */
class QuotaSampleSpec extends SparkSuite {

  // marker-bearing texts so detectedLang yields three strata: en, de, und
  private def mkCorpus(nEn: Int, nDe: Int, nUnd: Int, files: Int): String = {
    val tmp = Files.createTempDirectory("graft-quota").toString
    import spark.implicits._
    val rows =
      (1 to nEn).map(i => (i.toLong, "the cat is on the mat and happy")) ++
        (1 to nDe).map(i => (1000L + i, "der hund ist nicht das problem und")) ++
        (1 to nUnd).map(i => (2000L + i, "zzz qqq xxx"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("xx"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(files)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def windowReference(dir: String, quota: Int): Set[(String, Long)] = {
    val scored = graft.Catalog.documents(spark, dir)
      .select(col("doc_id"),
        TextOps.detectedLang(col("text")).as("lang_det"),
        TextOps.hash60(concat(lit("quota:"), col("doc_id").cast("string")))
          .as("qk"))
    val w = Window.partitionBy(col("lang_det"))
      .orderBy(col("qk"), col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .select(col("lang_det"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("z8 equals the window formulation; sub-quota strata keep all rows") {
    val dir = mkCorpus(nEn = 12, nDe = 9, nUnd = 3, files = 1)
    val quota = 5
    val got = Pipeline.quotaSampleAt(quota)(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == windowReference(dir, quota))
    val byLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byLang == Map("en" -> 5, "de" -> 5, "und" -> 3),
      s"over-quota strata capped at 5, und (3 docs < quota) kept whole: $byLang")
  }

  test("kept set is invariant to input file layout (heap merge path)") {
    val quota = 4
    // same logical corpus written as 1 file vs 13 files: partial heaps
    // from 13 splits must merge to the same threshold
    val one = mkCorpus(20, 7, 2, files = 1)
    val many = mkCorpus(20, 7, 2, files = 13)
    val a = Pipeline.quotaSampleAt(quota)(spark, one)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Pipeline.quotaSampleAt(quota)(spark, many)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("plan broadcasts the threshold and has no window over the corpus") {
    val dir = mkCorpus(6, 6, 0, files = 2)
    val plan = Pipeline.quotaSampleAt(3)(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"threshold side must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"the corpus must not pay a window sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"bounded heap aggregate should plan as ObjectHashAggregate:\n$plan")
  }

  test("topk_threshold: all-NULL group yields NULL; NULL rows ignored") {
    import spark.implicits._
    val df = Seq(
      (Some(10L), Some(1L), "a"), (Some(5L), Some(2L), "a"),
      (None: Option[Long], Some(3L), "a"),
      (None: Option[Long], None: Option[Long], "b"))
      .toDF("k", "id", "g")
    val rows = df.groupBy(col("g"))
      .agg(graft.expressions.SketchFunctions
        .topk_threshold(col("k"), col("id"), 2).as("th"))
      .collect().map(r => r.getString(0) -> Option(r.getStruct(1))).toMap
    // group a: pairs (5,2),(10,1); NULL-key row ignored → threshold (10,1)
    assert(rows("a").exists(s => s.getLong(0) == 10L && s.getLong(1) == 1L))
    assert(rows("b").isEmpty, "all-NULL group has no threshold")
  }
}
