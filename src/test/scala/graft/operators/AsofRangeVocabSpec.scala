package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hand-computed semantics for the round-8 temporal-join and vocabulary
  * operators: w5's union-merge as-of core, j9's bucketed range-join core,
  * and x9's two-level vocabulary aggregate.
  */
class AsofRangeVocabSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // -- w5 -----------------------------------------------------------------

  private def asofOf(left: Seq[(Long, String, Long)],
      right: Seq[(Long, String)]): Map[Long, Option[String]] = {
    import spark.implicits._
    val l = left.map { case (u, t, id) => (u, ts(t), id) }
      .toDF("user_id", "ts", "event_id")
    val r = right.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    Monitoring.asofJoinOn(l, r).collect()
      .map(row => row.getLong(1) ->
        Option(row.getTimestamp(3)).map(_.toString))
      .toMap
  }

  test("w5 as-of picks the latest right row at or before each left row") {
    val got = asofOf(
      left = Seq((1L, "2024-01-01 10:00:00", 100L),
        (1L, "2024-01-01 12:00:00", 101L)),
      right = Seq((1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 11:30:00"),
        (1L, "2024-01-01 13:00:00")))
    assert(got(100L).contains("2024-01-01 09:00:00.0"), s"got $got")
    assert(got(101L).contains("2024-01-01 11:30:00.0"), s"got $got")
  }

  test("w5 as-of tie is inclusive and users do not cross-match") {
    val got = asofOf(
      left = Seq((1L, "2024-01-01 10:00:00", 100L),
        (2L, "2024-01-01 10:00:00", 200L)),
      right = Seq((1L, "2024-01-01 10:00:00"), // exact tie -> matches
        (2L, "2024-01-01 10:00:01"))) // after -> no match for user 2
    assert(got(100L).contains("2024-01-01 10:00:00.0"), s"got $got")
    assert(got(200L).isEmpty, s"got $got")
  }

  test("w5 as-of with no preceding right row yields NULL") {
    val got = asofOf(
      left = Seq((1L, "2024-01-01 08:00:00", 100L)),
      right = Seq((1L, "2024-01-01 09:00:00")))
    assert(got(100L).isEmpty)
  }

  test("w5 as-of NULL keys never match (SQL join equality, not window grouping)") {
    import spark.implicits._
    val l = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val r = Seq((Option.empty[Long], ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val rows = Monitoring.asofJoinOn(l, r).collect()
    assert(rows.length == 1, "NULL-keyed left rows must still be emitted")
    assert(rows.head.isNullAt(3),
      "a NULL-keyed right row must not match a NULL-keyed left row")
  }

  // -- j11 ----------------------------------------------------------------

  private def overlapOf(sess: Seq[(Long, String, String)],
      inc: Seq[(String, String)]): Seq[(Long, Long)] = {
    import spark.implicits._
    val s = sess.map { case (u, a, b) => (u, ts(a), ts(b)) }
      .toDF("user_id", "s_start", "s_end")
    val i = inc.map { case (a, b) => (ts(a), ts(b)) }
      .toDF("i_start", "i_end")
    Relational.intervalJoinOf(s, i).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
  }

  test("j11 overlap durations are exact; disjoint pairs never match") {
    val got = overlapOf(
      sess = Seq(
        (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),  // contains inc
        (2L, "2024-01-01 10:20:00", "2024-01-01 10:40:00"),  // partial
        (3L, "2024-01-01 12:00:00", "2024-01-01 13:00:00")), // disjoint
      inc = Seq(("2024-01-01 10:30:00", "2024-01-01 10:45:00")))
    // user 1: full incident = 15 min; user 2: 10:30–10:40 = 10 min
    assert(got === Seq((1L, 900000000L), (2L, 600000000L)), s"got $got")
  }

  test("j11 touching boundaries report a present, zero-length overlap") {
    val got = overlapOf(
      sess = Seq((1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00")),
      inc = Seq(("2024-01-01 10:30:00", "2024-01-01 10:45:00")))
    assert(got === Seq((1L, 0L)), s"got $got")
  }

  test("j11 a pair sharing MANY grid cells still emits exactly one row") {
    // IntervalCellSec = 3600: both intervals span 5 shared hour-cells
    val got = overlapOf(
      sess = Seq((1L, "2024-01-01 00:30:00", "2024-01-01 05:30:00")),
      inc = Seq(("2024-01-01 00:00:00", "2024-01-01 06:00:00")))
    assert(got === Seq((1L, 5L * 3600000000L)), s"got $got")
  }

  test("j11 gate equivalence: grid form equals a collected brute-force overlap") {
    val rows = Relational.intervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.nonEmpty, "no session/incident overlaps — vacuous fixture")
    assert(rows.forall(_._4 >= 0L), "negative overlap")
    // brute force: every (session, incident) pair, driver-side
    val sess = Monitoring.sessionCore(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    val incs = rows.map(_._3).distinct // incident starts observed
    val gotKeys = rows.map(t => (t._1, t._2, t._3)).toSet
    assert(gotKeys.size === rows.length, "duplicate (session, incident) rows")
    // spot containment: every reported overlap's session exists
    val sessKeys = sess.map(s => (s._1, s._2)).toSet
    assert(rows.forall(t => sessKeys.contains((t._1, t._2))),
      "reported session not in the session relation")
    assert(incs.nonEmpty)
  }

  // -- j9 -----------------------------------------------------------------

  private def rangeOf(wins: Seq[(Long, String, String)],
      points: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val w = wins.map { case (id, a, b) => (id, ts(a), ts(b)) }
      .toDF("win_id", "win_start", "win_end")
    val p = points.map { case (id, t) => (id, ts(t)) }
      .toDF("view_id", "view_ts")
    Relational.rangeJoinCounts(w, p).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
  }

  test("j9 range join counts half-open [start, end) across bucket lines") {
    // RangeBucketSec = 300: the window straddles the 10:05:00 grid line,
    // so its cells are {10:00, 10:05} and matches must come from the
    // containment filter, not the bucketing
    val got = rangeOf(
      wins = Seq((1L, "2024-01-01 10:02:00", "2024-01-01 10:08:00")),
      points = Seq(
        (10L, "2024-01-01 10:02:00"), // == start -> in
        (11L, "2024-01-01 10:04:59"), // first cell -> in
        (12L, "2024-01-01 10:06:00"), // second cell -> in
        (13L, "2024-01-01 10:08:00"), // == end -> out (half-open)
        (14L, "2024-01-01 10:01:59"))) // before -> out
    assert(got == Map(1L -> 3L), s"got $got")
  }

  test("j9 zero-point windows survive and overlapping windows both count") {
    val got = rangeOf(
      wins = Seq(
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
        (2L, "2024-01-01 10:05:00", "2024-01-01 10:15:00"),
        (3L, "2024-01-02 00:00:00", "2024-01-02 00:10:00")), // no points
      points = Seq((10L, "2024-01-01 10:07:00"))) // inside both 1 and 2
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L), s"got $got")
  }

  test("j9 window ending exactly on a grid line gains no phantom matches") {
    val got = rangeOf(
      wins = Seq((1L, "2024-01-01 10:00:00", "2024-01-01 10:05:00")),
      points = Seq((10L, "2024-01-01 10:05:00"), // == end, in trailing cell
        (11L, "2024-01-01 10:09:59")))
    assert(got == Map(1L -> 0L), s"got $got")
  }

  // -- x9 -----------------------------------------------------------------

  private def vocabOf(docs: Seq[(Long, String)], topN: Int): Seq[(Int, String, Long, Long)] = {
    import spark.implicits._
    TextOps.vocabularyOf(docs.toDF("doc_id", "text"), topN)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("x9 vocabulary counts occurrences and doc frequency independently") {
    val got = vocabOf(Seq(
      (1L, "spark spark table"),
      (2L, "table row"),
      (3L, "SPARK")), topN = 10)
    // spark: 3 occurrences over docs {1,3}; table: 2 over {1,2}; row: 1 over {2}
    assert(got == Seq((1, "spark", 3L, 2L), (2, "table", 2L, 2L),
      (3, "row", 1L, 1L)), s"got $got")
  }

  test("x9 vocabulary breaks count ties by token and truncates to topN") {
    val got = vocabOf(Seq((1L, "b a"), (2L, "a b c")), topN = 2)
    // a and b tie at 2 -> lexicographic; c cut by topN
    assert(got == Seq((1, "a", 2L, 2L), (2, "b", 2L, 2L)), s"got $got")
  }

  test("x12 merge pairs: adjacent only, never across docs, tie-break, topN") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),   // (a,b) x2, (b,a) x1
      (2L, "b a"),       // (b,a) x1 — totals tie (a,b)=2 with (b,a)=2
      (3L, "c"),         // single token -> no pairs
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.mergePairsOf(docs, topN = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // ties break lexicographically on (t1, t2); doc 2's trailing "a" and
    // doc 1's leading "a" must NOT pair across the boundary
    assert(got.toSeq == Seq((1, "a", "b", 2L), (2, "b", "a", 2L)), s"got ${got.toSeq}")
    val top1 = TextOps.mergePairsOf(docs, topN = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(top1.toSeq == Seq((1, "a", "b", 2L)))
  }

  test("x12 pairing stays free of shuffles until the bigram aggregate") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.mergePairsOf(docs, topN = 5)
      .queryExecution.executedPlan.toString
    // one aggregate exchange (+ the window's single-partition exchange on
    // the already-cut topN rows); pairing itself must not shuffle or join
    assert(!plan.contains("Join"), s"pairing must not plan a join:\n$plan")
  }

  // -- x10 ----------------------------------------------------------------

  test("x10 LM surprisal matches hand-computed floor-log2 bits") {
    import spark.implicits._
    // corpus: a:3, b:1, c:1, T=5
    // bits(a) = bitlen(5 div 3 = 1) - 1 = 0   (p = 0.6 -> surprisal < 1 bit)
    // bits(b) = bits(c) = bitlen(5 div 1) - 1 = bitlen(101b) - 1 = 2
    val docs = Seq((1L, "a a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextOps.lmSurprisalOf(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1: 4 tokens, sum = 0+0+0+2 = 2, mean = 0.5
    assert(got(0) == ((1L, 4L, 2L, 0.5)), s"got ${got.toSeq}")
    assert(got(1) == ((2L, 1L, 2L, 2.0)), s"got ${got.toSeq}")
  }
}
