package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** d16 directed-containment semantics: the quote-inside-aggregator case
  * Jaccard misses, direction, the exact-4/5 threshold edge, and
  * gate-candidates ≡ brute-force on the fixture.
  */
class ContainmentSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("an excerpt is contained in its aggregator, not vice versa") {
    val article = (1 to 12).map(i => s"w$i").mkString(" ")
    val aggregator = ((1 to 12).map(i => s"w$i") ++
      (1 to 60).map(i => s"filler$i")).mkString(" ")
    val out = Dedup.containmentDedupOf(docs(1L -> article, 2L -> aggregator))
    assert(pairs(out) == Set((1L, 2L)), s"got ${pairs(out)}")
    // and the Jaccard blindness this operator exists for: same pair,
    // J = 10/70 ≈ 0.14 — far below d4's 0.5 near-dup bar
    val j = out.collect().head
    assert(j.getLong(2) * 5 < (j.getLong(3) + j.getLong(4) - j.getLong(2)),
      "pair would have passed a Jaccard bar — fixture too easy")
  }

  test("identical documents contain each other (both directions)") {
    val t = "a b c d e f g"
    val out = Dedup.containmentDedupOf(docs(1L -> t, 2L -> t))
    assert(pairs(out) == Set((1L, 2L), (2L, 1L)))
  }

  test("threshold holds at exactly 4/5 and cuts at 3/5") {
    val shared = "w1 w2 w3 w4 w5 w6"
    val keep = s"w1 w2 w3 w4 w5 w6 q"        // 4 of 5 shingles shared
    val cut = "w1 w2 w3 w4 w5 q2 q3"          // 3 of 5 shingles shared
    val container = s"$shared r s t"
    val out = Dedup.containmentDedupOf(
      docs(1L -> keep, 2L -> container, 3L -> cut))
    val got = pairs(out)
    assert(got.contains((1L, 2L)), s"exact-4/5 pair dropped: $got")
    assert(!got.contains((3L, 2L)), s"3/5 pair kept: $got")
    val row = out.collect().find(r => r.getLong(0) == 1L).get
    assert(row.getLong(5) == 800000L, s"ppm: $row")
  }

  test("random corpora: operator equals a driver-side set computation") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val vocab = (0 until 30).map(i => s"v$i")
      val corpus = (0L until 20L).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = Dedup.containmentDedupOf(docs(corpus: _*)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: shingle sets in plain Scala, same k=3 windows
      def shingles(t: String): Set[Seq[String]] = {
        val w = t.toLowerCase.trim.split("\\s+").toSeq
        if (w.length < 3) Set.empty else w.sliding(3).toSeq.toSet
      }
      val sh = corpus.map { case (id, t) => id -> shingles(t) }.toMap
      val expect = (for {
        (a, sa) <- sh; (b, sb) <- sh
        if a != b && sa.nonEmpty && 5 * (sa & sb).size >= 4 * sa.size
      } yield (a, b)).toSet
      assert(got == expect, s"got $got expect $expect")
    }
  }

  test("fixture: pruned candidates equal the brute-force relation") {
    val gate = Dedup.containmentDedup(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    val brute = Dedup.containmentDedupOf(
      graft.Catalog.documents(spark, sfDir)).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(gate.nonEmpty, "no containment pairs on the fixture — vacuous")
    assert(gate.sorted == brute.sorted)
  }
}
