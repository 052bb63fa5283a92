package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** diffByKey classification semantics, including the NULL-payload edges
  * that a fingerprint-nullness implementation would misclassify.
  */
class DiffSpec extends SparkSuite {

  import spark.implicits._

  test("added / removed / changed / unchanged classify by key presence + fingerprint") {
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "payload")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "payload")
    val got = Diff.diffByKey(a, b, "id", TextOps.hash60(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("NULL payloads: present-in-both is unchanged; NULL vs value is changed") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, None))
      .toDF("id", "payload")
    val b = Seq((1L, Option.empty[String]), (2L, None), (3L, Some("y")))
      .toDF("id", "payload")
    val got = Diff.diffByKey(a, b, "id", TextOps.hash60(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1: NULL -> NULL = unchanged (absent); a fingerprint-null
    // implementation would report it 'added'
    assert(got == Map(2L -> "changed", 3L -> "changed"))
  }

  test("identical snapshots diff to empty") {
    val a = Seq((1L, "p"), (2L, "q")).toDF("id", "payload")
    assert(Diff.diffByKey(a, a, "id", TextOps.hash60(col("payload"))).isEmpty)
  }

  test("u4 three-way merge: every resolution class on a hand-built triple") {
    // base keys 1-9 and 14; branch edits/deletes/adds hit each branch,
    // including BOTH directions of the delete/modify conflict (9, 14)
    val base = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e",
      6L -> "f", 7L -> "g", 8L -> "h", 9L -> "i", 14L -> "z").toDF("id", "p")
    val ours = Seq(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D", 5L -> "X",
      /* 6 deleted */ 7L -> "g", /* 8, 9 deleted */ 14L -> "Z!",
      10L -> "new", 11L -> "both", 12L -> "mine").toDF("id", "p")
    val theirs = Seq(1L -> "a", 2L -> "b", 3L -> "C", 4L -> "D", 5L -> "Y",
      6L -> "f", /* 7, 8 deleted */ 9L -> "I2", /* 14 deleted */
      11L -> "both", 12L -> "theirs", 13L -> "added").toDF("id", "p")
    val got = Diff.mergeByKey(base, ours, theirs, "id",
        TextOps.hash60(col("p")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged",       // untouched everywhere
      2L -> "take_ours",       // only ours moved
      3L -> "take_theirs",     // only theirs moved
      4L -> "both_same",       // identical edit both sides
      5L -> "conflict_edit",   // divergent edits
      6L -> "deleted",         // ours deleted, theirs unchanged
      7L -> "deleted",         // theirs deleted, ours unchanged
      8L -> "deleted",         // deleted in both
      9L -> "conflict_delete", // ours deleted, theirs modified
      14L -> "conflict_delete", // ours modified, theirs deleted
      10L -> "take_ours",      // added in ours only
      11L -> "both_same",      // added identically in both
      12L -> "conflict_add",   // added with different content
      13L -> "take_theirs"),   // added in theirs only
      s"got $got")
  }

  test("u4 properties: branch-swap symmetry; one-sided merge degenerates to the diff") {
    import org.apache.spark.sql.DataFrame
    // deterministic pseudo-random corpus + two derived branches
    def payload(k: Long, tag: String) = s"$tag-${(k * 2654435761L) % 997}"
    val base = (1L to 60L).map(k => k -> payload(k, "b")).toDF("id", "p")
    val ours = (1L to 60L).filter(_ % 7 != 0)
      .map(k => k -> (if (k % 5 == 0) payload(k, "o") else payload(k, "b")))
      .toDF("id", "p")
    val theirs = (1L to 60L).filter(_ % 11 != 0)
      .map(k => k -> (if (k % 3 == 0) payload(k, "t") else payload(k, "b")))
      .toDF("id", "p")
    def merge(a: DataFrame, b: DataFrame, c: DataFrame) =
      Diff.mergeByKey(a, b, c, "id", TextOps.hash60(col("p")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // swapping the branches swaps exactly the directional resolutions
    val fwd = merge(base, ours, theirs)
    val swapped = merge(base, theirs, ours)
    val flip = Map("take_ours" -> "take_theirs", "take_theirs" -> "take_ours")
    assert(fwd.view.mapValues(v => flip.getOrElse(v, v)).toMap == swapped,
      "merge must be symmetric up to the ours/theirs relabeling")
    // merging against an untouched second branch IS the two-way diff:
    // changed -> take_ours, removed -> deleted, nothing conflicts
    val oneSided = merge(base, ours, base)
    val diff = Diff.diffByKey(base, ours, "id", TextOps.hash60(col("p")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = diff.view.mapValues {
      case "changed" => "take_ours"
      case "added"   => "take_ours"
      case "removed" => "deleted"
    }.toMap
    assert(oneSided.filter(_._2 != "unchanged") == expected,
      s"one-sided merge must equal the diff: ${oneSided.filter(_._2 != "unchanged")} vs $expected")
    assert(!oneSided.values.exists(_.startsWith("conflict")),
      "a one-sided merge can never conflict")
  }

  test("u4 NULL payloads are content: NULL-kept vs NULL-kept merges unchanged") {
    val base = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "p")
    val ours = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "p")
    val theirs = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "p")
    val got = Diff.mergeByKey(base, ours, theirs, "id",
        TextOps.hash60(col("p")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: NULL everywhere = unchanged; 2: ours nulled the payload (an
    // edit), theirs kept it -> take_ours
    assert(got == Map(1L -> "unchanged", 2L -> "take_ours"))
  }

  test("u2 ingests only quality, non-duplicate delta documents") {
    def long(tag: String) = tag + " body " * 30 // well past MinIngestChars
    val oldSnap = Seq(
      (1L, long("alpha")), (2L, long("beta")), (3L, "short old"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, long("alpha")),        // unchanged -> not in the delta
      (2L, long("beta-edited")),  // changed, quality, unique -> ingested
      (4L, long("alpha")),        // added but an exact dup of doc 1 -> anti-joined away
      (5L, "tiny"),               // added but under the quality floor
      (6L, long("gamma")))        // added, quality, unique -> ingested
      .toDF("doc_id", "text")
    val got = Diff.incrementalCurationOf(oldSnap, newSnap).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (6L, "added")), s"got $got")
  }

  // ---------------------------------------------------------------------
  // u5 — provenance fold
  // ---------------------------------------------------------------------

  test("u5 provenance: introduction, change, deletion, re-add, NULL content") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def snap(rows: (Long, Option[String])*) = rows.toDF("doc_id", "text")
    // A stable; B edited at v2; C NULL throughout (null-safe: no change);
    // D added at v2, deleted at v3; E deleted at v2, RE-ADDED at v3 with
    // new content (the change counts — content moved across its absence)
    val v1 = snap(1L -> Some("x"), 2L -> Some("y"), 3L -> None,
      5L -> Some("e1"))
    val v2 = snap(1L -> Some("x"), 2L -> Some("y2"), 3L -> None,
      4L -> Some("w"))
    val v3 = snap(1L -> Some("x"), 2L -> Some("y2"), 3L -> None,
      5L -> Some("e2"))
    val got = Diff.provenanceOf(Seq(1 -> v1, 2 -> v2, 3 -> v3), "doc_id",
        graft.operators.TextOps.hash60(col("text")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((1, 1, 0L, 3L)), "stable doc never changes")
    assert(got(2L) === ((1, 2, 1L, 3L)), "one edit at v2")
    assert(got(3L) === ((1, 1, 0L, 3L)), "NULL payload compares null-safely")
    assert(got(4L) === ((2, 2, 0L, 1L)), "added then deleted: 1 presence")
    assert(got(5L) === ((1, 3, 1L, 2L)),
      "re-add with new content counts as a change across the absence")
  }

  test("u5 fixture gate: rule-consistent with the u3 timeline") {
    val got = Diff.provenance(spark, sfDir).collect()
    val docs = graft.Catalog.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(got.length === docs.size + docs.count(_._1 % 50 == 3))
    got.foreach { r =>
      val (id, intro, last, nRev) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
      if (id >= graft.operators.Search.AddedIdOffset)
        assert(intro === 2 && nRev === 0L, s"added doc $id")
      else if (id % 10 == 7 && docs(id))
        assert(last === 2 && nRev === 1L, s"revised doc $id")
      else assert(last === 1 && nRev === 0L, s"untouched doc $id")
    }
  }
}
