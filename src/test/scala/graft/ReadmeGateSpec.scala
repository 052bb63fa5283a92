package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The README's per-round "oracle gate" cells must equal the driver's
  * `CORRECTNESS_r{N}.json` artifacts — round 7 shipped a README claiming
  * 65/65 while the same-commit artifact recorded 64/65 (the r7 verdict's
  * worst finding was the overclaim, not the bug). The scoreboard is now
  * derived-checked: any drift between a claimed gate cell and the artifact
  * it cites fails the build. No Spark session needed — this is pure file
  * reconciliation, run from the repo root (sbt's working dir).
  */
class ReadmeGateSpec extends AnyFunSuite {

  private def repoFile(name: String): Path = Paths.get(name)

  test("README gate cells match the driver CORRECTNESS artifacts") {
    val artifacts: List[Path] = {
      val s = Files.list(Paths.get("."))
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("CORRECTNESS_r\\d+\\.json"))
        .toList
      finally s.close()
    }
    assume(artifacts.nonEmpty, "no CORRECTNESS artifacts present (fresh clone)")
    assume(Files.exists(repoFile("README.md")))

    val readme = Files.readString(repoFile("README.md"))
    // a state-table row like: | r7 | 123/123 | 64/65 hash² | … |
    val rowRe = raw"\|\s*r(\d+)\s*\|[^|]*\|\s*(\d+)/(\d+) hash".r
    val claimed: Map[Int, (Int, Int)] = rowRe.findAllMatchIn(readme)
      .map(m => m.group(1).toInt -> (m.group(2).toInt, m.group(3).toInt))
      .toMap
    assert(claimed.nonEmpty, "README has no per-round gate rows to check")

    // (greenCount, entryCount): a registry query ABSENT from the artifact
    // is an analysis failure, not a skip (the driver omits queries that
    // err), so the claimed total may legitimately EXCEED the entry count —
    // r8's 55/90 has 55 all-green entries over a 90-query registry. Pure
    // entry-counting would under-report that round as 55/55.
    val actual: Map[Int, (Int, Int)] = artifacts.map { p =>
      val round = p.getFileName.toString.replaceAll("\\D", "").toInt
      val txt = Files.readString(p)
      val entries = raw""""hash_match"""".r.findAllIn(txt).size
      val green = raw""""hash_match":\s*true""".r.findAllIn(txt).size
      round -> (green, entries)
    }.toMap

    // every CLAIMED row must match its artifact; a round with no row yet
    // (the artifact lands after the round's last commit) is honest and
    // passes — only a wrong number is drift
    claimed.foreach { case (round, (cp, ct)) =>
      actual.get(round).foreach { case (green, entries) =>
        assert(cp == green,
          s"README claims $cp green for round $round but the artifact " +
            s"records $green hash-true entries — the scoreboard must " +
            "match the driver's gate")
        assert(ct >= entries,
          s"README claims a $ct-query registry for round $round but the " +
            s"artifact alone has $entries entries")
        // bound the denominator above too (a '55/9999 hash' overclaim
        // must fail) — by the largest registry any artifact or the live
        // session has ever seen, NOT the live size alone: a legitimate
        // future deprecation shrinking the registry must not retro-fail
        // accurate historical rows
        val maxKnownRegistry = math.max(SparkEntry.queries.size,
          actual.values.map(_._2).max)
        assert(ct <= math.max(entries, maxKnownRegistry),
          s"README claims a $ct-query registry for round $round but no " +
            s"registry that large ever existed (largest known: " +
            s"$maxKnownRegistry; artifact entries: $entries) — the " +
            "denominator is invented")
      }
      // and a claimed row must cite an artifact that exists — a gate
      // number with no artifact behind it is invented
      assert(actual.contains(round),
        s"README claims a gate result for round $round but no " +
          "CORRECTNESS artifact for it exists")
    }
  }

  test("Current-state prose matches the live registry and newest artifact") {
    assume(Files.exists(repoFile("README.md")))
    val readme = Files.readString(repoFile("README.md"))

    // the registry count in prose must be the LIVE registry, not a stale one
    val regRe = raw"Current state: (\d+) registered queries".r
    val claimedReg = regRe.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
      .getOrElse(fail("README lost its 'Current state: N registered queries' prose"))
    assert(claimedReg == SparkEntry.queries.size,
      s"README prose claims $claimedReg registered queries but the " +
        s"registry has ${SparkEntry.queries.size}")

    // the prose must cite the NEWEST driver artifact with its true green
    // count (absence = red): round-8 lesson — a true-when-written claim
    // went stale the moment a newer artifact landed
    val artifacts: Map[Int, String] = {
      val s = Files.list(Paths.get("."))
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("CORRECTNESS_r\\d+\\.json"))
        .map(p => p.getFileName.toString.replaceAll("\\D", "").toInt ->
          Files.readString(p))
        .toMap
      finally s.close()
    }
    assume(artifacts.nonEmpty, "no CORRECTNESS artifacts present (fresh clone)")
    val greenIn = (txt: String) =>
      raw""""hash_match":\s*true""".r.findAllIn(txt).size
    val (newestRound, newestTxt) = artifacts.maxBy(_._1)
    val newestGreen = greenIn(newestTxt)
    val proseRe = raw"Newest driver artifact: r(\d+), (\d+)/(\d+) green".r
    val m = proseRe.findFirstMatchIn(readme)
      .getOrElse(fail("README lost its 'Newest driver artifact: rN, X/Y green' prose"))
    val citedRound = m.group(1).toInt
    val citedGreen = m.group(2).toInt

    // The cited round's claim must match its artifact EXACTLY — a wrong
    // number is the round-7 overclaim all over again.
    val citedTxt = artifacts.getOrElse(citedRound,
      fail(s"README cites r$citedRound but no CORRECTNESS artifact for it exists"))
    assert(citedGreen == greenIn(citedTxt),
      s"README claims $citedGreen green for r$citedRound but the " +
        s"artifact records ${greenIn(citedTxt)}")

    // A NEWER artifact than the cited one is expected at every round
    // boundary (the round-N artifact lands after round N's last commit),
    // so mere existence is not drift — the r9 lesson is that the old
    // freshness assertion guaranteed one red per round. Fail only on
    // CONTRADICTION: a newer artifact recording FEWER greens than the
    // README's current-state claim means the prose now overstates the
    // engine (the r8 fixture break is exactly this shape) and must be
    // rewritten, not merely refreshed.
    artifacts.filter(_._1 > citedRound).foreach { case (round, txt) =>
      assert(greenIn(txt) >= citedGreen,
        s"CORRECTNESS_r$round records ${greenIn(txt)} green — a regression " +
          s"from the $citedGreen the README claims for r$citedRound; the " +
          "current-state prose overstates the engine and must be updated")
    }
  }
}
