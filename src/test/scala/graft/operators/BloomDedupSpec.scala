package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.HashFunctions.bloom_might_contain
import graft.expressions.SketchFunctions.bloom_build

/** d9 Bloom-prefiltered dedup: the probe has no false NEGATIVES (every
  * inserted key hits), false positives are routed through the exact
  * anti-join and survive (a deliberately-tiny filter forces collisions),
  * the distributed build is partitioning-invariant, and the full operator
  * equals the plain anti-join row for row.
  */
class BloomDedupSpec extends SparkSuite {

  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 500L).map(_ * 0x9e3779b97f4a7c15L)
    val words = keys.toDF("fp")
      .agg(bloom_build(col("fp"), 1 << 14, 4)).collect().head.getSeq[Long](0)
    val misses = keys.toDF("fp")
      .filter(!bloom_might_contain(col("fp"), words, 4)).count()
    assert(misses == 0)
  }

  test("the build is partitioning-invariant (word-OR merge)") {
    val keys = (1L to 300L).map(_ * 0x2545f4914f6cdd1dL)
    def build(parts: Int): Seq[Long] =
      keys.toDF("fp").repartition(parts)
        .agg(bloom_build(col("fp"), 1 << 12, 3)).collect().head.getSeq[Long](0)
    assert(build(1) == build(7))
  }

  test("false positives route through the verify join and results stay exact") {
    // a 64-bit, 1-probe filter over 40 existing keys is ~half full —
    // non-duplicate incoming keys WILL collide, and must still survive
    // via the anti-join
    val existing = (1000L to 1039L).map(k => (k, k * 31L)).toDF("doc_id", "fp")
    val incoming = ((1L to 60L).map(k => (k, k * 997L)) :+ (61L, 1005L * 31L))
      .toDF("doc_id", "fp") // 60 fresh keys + 1 true duplicate
    val got = Dedup.bloomNewDocs(incoming, existing, numBits = 64, probes = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 60L).toSet) // dup dropped, every fresh key kept
    // and the tiny filter really did fire on fresh keys (the FP path ran)
    val words = existing.agg(bloom_build(col("fp"), 64, 1))
      .collect().head.getSeq[Long](0)
    val fp = incoming.filter(col("doc_id") <= 60)
      .filter(bloom_might_contain(col("fp"), words, 1)).count()
    assert(fp > 0, "expected at least one false positive at this density")
  }

  test("d9 equals the plain anti-join on the fixture") {
    val docs = graft.Catalog.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.prefixFingerprint(col("text")).as("fp"))
    val existing = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    val plain = incoming.join(existing.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val viaBloom = Dedup.bloomDedup(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain && plain.nonEmpty)
  }

  test("the probe expression stays inside whole-stage codegen") {
    val words = Seq(1L, 2L, 3L, 4L)
    val df = spark.range(8).toDF("id")
      .select(bloom_might_contain(col("id"), words, 2).as("hit"))
      .filter(col("hit").isNotNull)
    assert(df.count() == 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("bloom_might_contain"))
        .forall(_.replaceFirst("^[\\s+:-]*", "").startsWith("*(")),
      s"bloom_might_contain fell out of whole-stage codegen:\n$plan")
  }
}
