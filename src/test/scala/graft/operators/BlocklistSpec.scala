package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Blocklist-scrub semantics pinned on hand-built rows plus fixture
  * non-vacuity: blocked tokens become the tag, counts/ppm are exact
  * integers, the keep verdict flips exactly at the threshold, an absent
  * denylist term is a no-op, and NULL text propagates NULL everywhere.
  */
class BlocklistSpec extends SparkSuite {

  private def docsOf(rows: Seq[(Long, Option[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scrub(rows: Seq[(Long, Option[String])],
      terms: Seq[String], dropPpm: Long) =
    TextOps.blocklistScrubOf(docsOf(rows), terms, dropPpm)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hits become the tag; counts, ppm, and rebuild are exact") {
    val got = scrub(Seq(
      1L -> Some("Bad apple  among GOOD\tapples"), // case-folded, ws-canonical
      2L -> Some("all clean words here"),
      3L -> None),
      terms = Seq("bad", "apple"), dropPpm = 500000L)
    val r1 = got(1L)
    assert(r1.getString(1) === "<BLOCKED> <BLOCKED> among good apples")
    assert(r1.getInt(2) === 5 && r1.getInt(3) === 2)
    assert(r1.getLong(4) === 400000L)    // 2·10⁶/5, floor
    assert(r1.getBoolean(5))             // 400000 ≤ 500000
    val r2 = got(2L)
    assert(r2.getString(1) === "all clean words here")
    assert(r2.getInt(3) === 0 && r2.getLong(4) === 0L && r2.getBoolean(5))
    val r3 = got(3L)
    (1 to 5).foreach(i => assert(r3.isNullAt(i), s"col $i not NULL for NULL text"))
  }

  test("keep flips exactly at the ppm threshold") {
    // 1 blocked of 4 tokens = 250000 ppm
    val rows = Seq(1L -> Option("bad one two three"))
    assert(scrub(rows, Seq("bad"), 250000L)(1L).getBoolean(5))
    assert(!scrub(rows, Seq("bad"), 249999L)(1L).getBoolean(5))
  }

  test("a denylist term absent from the corpus is a no-op") {
    val got = scrub(Seq(1L -> Option("nothing matches here")),
      Seq("absent", "missing"), 0L)
    val r = got(1L)
    assert(r.getString(1) === "nothing matches here")
    assert(r.getInt(3) === 0 && r.getBoolean(5))
  }

  test("fixture scrub is non-vacuous and tag presence tracks the count") {
    val got = TextOps.blocklistScrub(spark, sfDir).collect()
    assert(got.exists(r => !r.isNullAt(3) && r.getInt(3) > 0),
      "no fixture doc hits the denylist — vacuous gate entry")
    assert(got.exists(r => !r.isNullAt(5) && !r.getBoolean(5)),
      "no fixture doc is dropped — threshold never exercised")
    got.filter(!_.isNullAt(1)).foreach { r =>
      val tagged = r.getString(1).contains(TextOps.BlockTag)
      assert(tagged === (r.getInt(3) > 0),
        s"doc ${r.getLong(0)}: tag presence disagrees with n_blocked")
    }
  }
}
