package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** n16 tombstone-aware IVF serve (round-12 verdict item #6): deletion is
  * non-vacuous on the fixture, the tombstoned maintained view commutes
  * with a post-delete rebuild (the frozen-quantizer argument), and the
  * accounting row pins recall 1.0 + no served tombstone.
  */
class TombstoneIvfSpec extends SparkSuite {

  private def isDeleted(id: Long): Boolean =
    id % Similarity.IvfDeleteMod == Similarity.IvfDeleteRes

  test("deletion is non-vacuous: the undeleted n12 serve returns at least " +
      "one vector the tombstone set removes") {
    val undeleted = Similarity.annIvfIncremental(spark, sfDir).collect()
      .map(_.getLong(1))
    assert(undeleted.exists(isDeleted),
      "no tombstoned vector ever appeared in the undeleted serve — the " +
        "delete slice exercises nothing at this fixture")
  }

  test("tombstone-filtered maintained lists EQUAL the post-delete rebuild " +
      "(set-wise): anti-join and rebuild commute under a frozen quantizer") {
    val emb = Similarity.nonZeroEmbeddings(spark, sfDir)
    val tomb = emb
      .filter(col("vec_id") % Similarity.IvfDeleteMod ===
        Similarity.IvfDeleteRes)
      .select(col("vec_id"))
    val filtered = Similarity.maintainedIvfLists(spark, sfDir)
      .join(tomb, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("centroid").cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = emb.join(tomb, Seq("vec_id"), "left_anti")
      .select(col("vec_id"),
        Similarity.assignColumnOf(Similarity.centroids)(col("embedding"))
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered.nonEmpty && filtered === rebuilt)
    assert(!filtered.exists(p => isDeleted(p._1)),
      "a tombstoned vector survived the anti-join")
  }

  test("accounting row: every rebuilt-serve pair is served (recall exactly " +
      "1.0) and no served vector is tombstoned") {
    val r = Similarity.annIvfDeletes(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) > 0L, "fixture must contain tombstones")
    assert(row.getLong(1) > 0L && row.getLong(1) === row.getLong(2),
      s"n_hits ${row.getLong(2)} != n_expected ${row.getLong(1)}")
    assert(row.getDouble(3) === 1.0)
    assert(row.getBoolean(4), "a tombstoned vector was served")
  }

  test("n17: the compacted artifact holds exactly the non-tombstoned " +
      "members, repeat calls serve the same persisted generation") {
    val compacted = Similarity.ivfListsCompacted(spark, sfDir)
    val ids = compacted.select(col("vec_id")).collect().map(_.getLong(0))
    assert(ids.nonEmpty && !ids.exists(isDeleted),
      "a tombstoned vector survived the compaction rewrite")
    val expected = Similarity.maintainedIvfLists(spark, sfDir)
      .filter(col("vec_id") % Similarity.IvfDeleteMod =!=
        Similarity.IvfDeleteRes)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids.toSet === expected,
      "compaction dropped a survivor or duplicated a member")
    assert(ids.length === ids.toSet.size, "compaction duplicated rows")
    val a = Similarity.ivfListsCompacted(spark, sfDir).inputFiles.toSet
    val b = Similarity.ivfListsCompacted(spark, sfDir).inputFiles.toSet
    assert(a.nonEmpty && a === b,
      "repeat calls must serve the same persisted artifact generation")
  }

  test("n17 accounting: the fixture crosses the trigger, the artifact " +
      "count reconciles with n_before - n_deleted, and serving is " +
      "identical across the compaction") {
    val r = Similarity.annIvfCompact(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nBefore, nDeleted, ppm) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nDeleted > 0L && ppm >= Similarity.IvfCompactTriggerPpm &&
      row.getBoolean(3), s"fixture must trigger compaction: $row")
    assert(row.getLong(4) === nBefore - nDeleted,
      s"artifact count ${row.getLong(4)} != $nBefore - $nDeleted")
    assert(row.getLong(5) > 0L && row.getLong(5) === row.getLong(6) &&
      row.getDouble(7) === 1.0,
      s"compacted serve must equal the post-delete rebuild: $row")
    assert(row.getBoolean(8), "a tombstoned vector was served post-compact")
    assert(row.getBoolean(9),
      "serving changed across the compaction — the rewrite is visible")
  }
}
