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
}
