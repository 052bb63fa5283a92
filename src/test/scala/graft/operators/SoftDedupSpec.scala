package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** d15 soft-dedup semantics: reweighting keeps every row and divides each
  * duplicate group's sampling mass evenly, on constructed duplicate groups
  * (the gate rides the fixture; these pin the invariants).
  */
class SoftDedupSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }),
      schema)
  }

  test("weights split a duplicate group's mass; singletons keep full weight") {
    val df = docs(
      1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "alpha  beta \t gamma", // whitespace-normalized into the group
      4L -> "delta epsilon")
    val got = Dedup.softDedupOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 333333L)), s"got $got")
    assert(got(2L) == ((3L, 333333L)))
    assert(got(3L) == ((3L, 333333L)))
    assert(got(4L) == ((1L, 1000000L)))
  }

  test("every input row survives and group mass never exceeds one document") {
    val df = docs((1L to 12L).map(i => i -> s"copy ${i % 3}"): _*)
    val out = Dedup.softDedupOf(df).collect()
    assert(out.length == 12)
    // 3 groups of 4 copies: each group's total weight = 4 * 250000 = 1e6
    val byFp = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byFp.values.toSeq == Seq.fill(3)(1000000L), s"got ${byFp.toMap}")
  }

  test("NULL text forms its own group like d1's fingerprint (never dropped)") {
    val df = docs(1L -> null.asInstanceOf[String], 2L -> null.asInstanceOf[String], 3L -> "real")
    val got = Dedup.softDedupOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // hash60(NULL) is NULL; both NULL-fp rows land in one window group
    assert(got(1L) == 500000L && got(2L) == 500000L && got(3L) == 1000000L,
      s"got $got")
  }
}
