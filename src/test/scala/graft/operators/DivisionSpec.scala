package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** e4 relational-division semantics: the FOR ALL quantifier on hand-built
  * coverage matrices, including the NULL-divisor and duplicate-event
  * edges that break naive count-matching implementations.
  */
class DivisionSpec extends SparkSuite {

  private def events(rows: (java.lang.Long, String)*) = {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, t) => Row(u, t) }),
      schema)
  }

  test("only users covering EVERY type qualify; duplicates don't inflate coverage") {
    val df = events(
      // user 1: all three types, one of them thrice (dup must not help)
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      // user 2: misses type c
      (2L, "a"), (2L, "b"), (2L, "a"),
      // user 3: all three
      (3L, "c"), (3L, "b"), (3L, "a"))
    val got = Relational.relationalDivisionOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (3L, 3L)), s"got $got")
  }

  test("NULL types are not divisor values; NULL users are not entities") {
    val df = events(
      (1L, "a"), (1L, null), // user 1 covers the only real type
      (null, "b"),           // a NULL user must not create type b
      (2L, "a"))
    val got = Relational.relationalDivisionOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // divisor = {a}: users 1 and 2 both qualify; the NULL rows change
    // nothing — had NULL counted, b would enter the divisor and NOBODY
    // would qualify
    assert(got == Seq((1L, 1L), (2L, 1L)), s"got $got")
  }
}
