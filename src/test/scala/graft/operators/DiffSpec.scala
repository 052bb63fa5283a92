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
}
