package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Scaling-sweep guard (round-11 verdict item #3): measure the
  * candidate-generating miners' growth across the one fixture step where
  * the documents corpus actually grows 10× (sf0.01 → sf0.1, 500 → 5000
  * docs; sf0.001 and sf0.01 share a 500-doc corpus), and pin the
  * invariant that actually holds each family at 100 TB.
  *
  * What the first sweep MEASURED (numbers preserved in the assertions
  * and logged on every run) — the naive "assert every candidate count
  * grows sub-quadratically" is NOT the right guard, because two-point
  * exponents here measure the corpus, not the algorithm:
  *
  *  - d2 LSH banding: 46 → 2,279 candidates, exponent 1.70. Genuinely
  *    sub-quadratic (band collisions concentrate on near-dups);
  *    asserted < 1.8.
  *  - c11 value-join fan-out: exponent 0.99 — linear, asserted < 1.8.
  *  - prefix-filter candidates (d2/d4/d6 arm): 25 → 124,961, exponent
  *    3.70 — while the VERIFIED output grew 25 → 256 (linear). This is
  *    the documented PRE-CAP TRANSIENT of prefix filtering (Bayardo et
  *    al. 2007): per-token candidate volume is Σ_h min(df,cap)², and
  *    while dfs sit far below the cap, df grows ∝ n and the sum grows
  *    ∝ n². Once dfs reach the cap the per-token term freezes and the
  *    sum is bounded by cap · |postings| = O(cap · n) — LINEAR with a
  *    cap-sized constant. The scale-invariant guards are therefore:
  *    (a) the postings relation itself grows ~linearly (each doc
  *    contributes ≤ (1−t)·|d|+1 rows, cap-filtered), and (b) the
  *    candidate join never exceeds the per-token budget Σ_h df_a·df_b
  *    computed from the SAME postings — a dropped join key or uncapped
  *    hot token violates (b) immediately at any scale.
  *  - d16 containment candidates: same family, same transient
  *    (61 → 299,516, exponent 3.69; verified output 50 → 512, linear);
  *    same (a)+(b) guards over its two sides.
  *  - m7/m9 pigeonhole banding: candidates are a CONSTANT fraction of
  *    all-pairs across the step (m7: 22.8% → 22.5%; m9 wide: 73.9% →
  *    73.4%) because the fixture's byte-residue histograms genuinely
  *    cluster within ~T of each other — at this threshold the TRUE
  *    near-dup relation is itself dense, and a lossless miner cannot
  *    emit fewer candidates than true pairs. The guard is that the
  *    all-pairs FRACTION does not grow across the step (a dropped band
  *    key degrades it toward 100%) plus the per-cell budget bound (b).
  *
  * All counts are logged every run so the growth record the verdict
  * asked for stays on the books.
  */
class ScalingSweepSpec extends SparkSuite {

  // The two sweep scales derive from the suite's configured fixture dir
  // (r12 ADVICE: hardcoded absolute paths silently coupled the suite to
  // one machine layout): sibling sf directories under the same root the
  // rest of the suite — and graft.Bench via SPARK_GRAFT_SF_DIR — use.
  private val FixtureRoot =
    java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent.toString
  private val LoDir = s"$FixtureRoot/sf0.01"
  private val HiDir = s"$FixtureRoot/sf0.1"

  private def requireSweepFixtures(): Unit =
    Seq(LoDir, HiDir).foreach { d =>
      assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)),
        s"scaling-sweep fixture dir $d absent — sweep needs the " +
          "sf0.01/sf0.1 pair next to the suite fixture; skipping")
    }

  private def docCount(dir: String): Long =
    graft.Catalog.documents(spark, dir).count()

  private def allPairs(n: Long): Double = n.toDouble * (n - 1) / 2

  private def exponent(cLo: Long, cHi: Long, nLo: Long, nHi: Long): Double =
    math.log(math.max(cHi, 1L).toDouble / math.max(cLo, 1L)) /
      math.log(nHi.toDouble / nLo)

  /** Σ over join keys of |sideA bucket| × |sideB bucket| — the exact
    * upper bound on the equi-join's output. An actual join output above
    * this number means rows matched OUTSIDE the per-key products, i.e.
    * the join degenerated (lost a key / went cross).
    */
  private def joinBudget(a: DataFrame, b: DataFrame,
      keys: Seq[String]): Long = {
    val ka = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("na"))
    val kb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nb"))
    // coalesce: an empty key intersection must report budget 0 (a clean
    // "candidates exceed budget 0" failure), not NPE on a null sum
    ka.join(kb, keys)
      .agg(org.apache.spark.sql.functions.coalesce(
        sum(col("na") * col("nb")), lit(0L)))
      .first().getLong(0)
  }

  test("empirically sub-quadratic miners stay sub-quadratic: d2 LSH " +
      "banding and c11 value-join fan-out") {
    requireSweepFixtures()
    val nLo = docCount(LoDir)
    val nHi = docCount(HiDir)
    val lshLo = Dedup.lshBandCandidates(Dedup.minhashSignatures(spark, LoDir))
      .distinct().count()
    val lshHi = Dedup.lshBandCandidates(Dedup.minhashSignatures(spark, HiDir))
      .distinct().count()
    val eLsh = exponent(lshLo, lshHi, nLo, nHi)
    info(f"d2_lsh_band: n $nLo -> $nHi, candidates $lshLo -> $lshHi, " +
      f"exponent $eLsh%.3f")
    assert(eLsh < 1.8, f"d2 LSH candidate growth $eLsh%.3f not sub-quadratic")

    def dJoin(dir: String): (Long, Long) = {
      val d = Profile.fkDistinctRelation(spark, dir)
      val fanout = d.select(col("col").as("from_col"), col("value"))
        .join(d.select(col("col").as("to_col"), col("value")), Seq("value"))
        .filter(col("from_col") =!= col("to_col"))
        .count()
      (d.count(), fanout)
    }
    val (dnLo, fLo) = dJoin(LoDir)
    val (dnHi, fHi) = dJoin(HiDir)
    val eC11 = exponent(fLo, fHi, dnLo, dnHi)
    info(f"c11_value_join: n $dnLo -> $dnHi, fan-out $fLo -> $fHi, " +
      f"exponent $eC11%.3f")
    assert(eC11 < 1.8, f"c11 fan-out growth $eC11%.3f not sub-quadratic")
  }

  test("prefix-filter family: postings grow linearly and candidates " +
      "never exceed the per-token budget (d2/d4/d6 arm and d16)") {
    requireSweepFixtures()
    val nLo = docCount(LoDir)
    val nHi = docCount(HiDir)

    // (a) postings linearity — the quantity the 100 TB asymptote
    // O(cap · |postings|) rides on
    val postLo = Dedup.prefixPostings(spark, LoDir).count()
    val postHi = Dedup.prefixPostings(spark, HiDir).count()
    val ePost = exponent(postLo, postHi, nLo, nHi)
    info(f"prefix postings: $postLo -> $postHi, exponent $ePost%.3f")
    assert(ePost < 1.2,
      f"prefix postings growth $ePost%.3f is super-linear — the per-doc " +
        "prefix-window bound regressed")

    // (b) candidate join ≤ per-token budget, both scales
    for (dir <- Seq(LoDir, HiDir)) {
      val pref = Dedup.prefixPostings(spark, dir)
      val budget = joinBudget(pref.select(col("h")), pref.select(col("h")),
        Seq("h"))
      val cand = Dedup.prefixIndexCandidates(spark, dir, dedup = false)
        .count()
      info(s"prefix candidates @$dir: $cand (budget $budget)")
      assert(cand <= budget,
        s"prefix candidates $cand exceed the per-token budget $budget — " +
          "the join degenerated past its h key")
    }
    for (dir <- Seq(LoDir, HiDir)) {
      val (prefA, exB) = Dedup.containmentCandidateSides(spark, dir)
      val budget = joinBudget(prefA, exB, Seq("h"))
      val cand = prefA.join(exB, "h")
        .filter(col("da") =!= col("db")).count()
      info(s"d16 candidates @$dir: $cand (budget $budget)")
      assert(cand <= budget,
        s"d16 candidates $cand exceed the per-token budget $budget")
    }

    // the transient is real but bounded: at the hi scale candidates are
    // still a small fraction of all-pairs (~1% measured); 10% is the
    // tripwire for an all-pairs regression at fixture scale
    val prefCandHi = Dedup.prefixIndexCandidates(spark, HiDir).count()
    val d16CandHi = Dedup.containmentCandidates(spark, HiDir).count()
    info(f"hi-scale fractions: prefix ${prefCandHi / allPairs(nHi)}%.4f, " +
      f"d16 ${d16CandHi / (2 * allPairs(nHi))}%.4f of all pairs")
    assert(prefCandHi < 0.1 * allPairs(nHi),
      s"prefix candidates $prefCandHi within 10x of all-pairs")
    assert(d16CandHi < 0.1 * 2 * allPairs(nHi),
      s"d16 candidates $d16CandHi within 10x of all (ordered) pairs")
  }

  test("c16 sample mass: hash60 determinant-group sampling keeps ~1/8 of " +
      "the groups at BOTH scales (the phase-1 work-reduction claim as a " +
      "measured number)") {
    requireSweepFixtures()
    // measured at pin time: 8,871 / 70,780 = 0.1253 (sf0.01) and
    // 88,972 / 705,858 = 0.1260 (sf0.1) against the nominal 1/8 = 0.125
    // — the md5 bucket neither correlates with the generators' key
    // strides nor drifts with scale. A broken sampler (residue-class
    // correlation, off-by-one bucket test) lands outside the band.
    for (dir <- Seq(LoDir, HiDir)) {
      val sampled = Profile.fdSampled(spark, dir)
        .agg(org.apache.spark.sql.functions.sum(col("n_det_sampled")))
        .head().getLong(0)
      val exact = Profile.fdDiscovery(spark, dir)
        .agg(org.apache.spark.sql.functions.sum(col("n_det")))
        .head().getLong(0)
      val ratio = sampled.toDouble / exact
      info(f"$dir: sampled $sampled of $exact determinant groups " +
        f"(ratio $ratio%.4f, nominal ${1.0 / Profile.FdSampleMod}%.4f)")
      assert(ratio > 0.115 && ratio < 0.135,
        f"sample mass $ratio%.4f strayed from the 1/8 nominal — the " +
          "group sampler is biased or disengaged")
    }
  }

  test("c21 sample mass: the xorshift group sampler keeps ~1/8 of the " +
      "value groups at BOTH scales (the kernel swap preserved the " +
      "phase-1 work-reduction claim)") {
    requireSweepFixtures()
    // c21 samples with the integer xor-shift kernel (key_sample_bucket),
    // not the family's md5 — this pin is the evidence the cheaper hash
    // still buckets uniformly on REAL key distributions at both scales
    // (an affine mix measured 0 sampled groups among small consecutive
    // keys before the non-linear fix; a biased one lands outside the
    // band). Ratio over c19's exact group counts, matched candidate for
    // candidate.
    for (dir <- Seq(LoDir, HiDir)) {
      val sampled = Profile.keySampled(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getLong(4)).toMap
      val exact = Profile.keyDiscovery(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getLong(4)).toMap
      assert(sampled.keySet === exact.keySet)
      val (s, e) = (sampled.values.sum, exact.values.sum)
      val ratio = s.toDouble / e
      info(f"$dir: sampled $s of $e value groups " +
        f"(ratio $ratio%.4f, nominal ${1.0 / Profile.FdSampleMod}%.4f)")
      assert(ratio > 0.11 && ratio < 0.14,
        f"sample mass $ratio%.4f strayed from the 1/8 nominal — the " +
          "xorshift group sampler is biased or disengaged")
    }
  }

  test("pigeonhole banding (m7/m9): all-pairs fraction does not grow " +
      "across the 10x step and candidates respect the per-cell budget") {
    requireSweepFixtures()
    val nLo = docCount(LoDir)
    val nHi = docCount(HiDir)
    for ((label, threshold) <- Seq(
        ("m7", Multimodal.NeardupL1Micro),
        ("m9_wide", Multimodal.NeardupL1MicroWide))) {
      def fraction(dir: String, n: Long): (Long, Double) = {
        val c = Multimodal.neardupCandidateJoin(
          Multimodal.mediaMicroIndexed(spark, dir), threshold)
          .select(col("da"), col("db")).distinct().count()
        (c, c / allPairs(n))
      }
      val (cLo, fLo) = fraction(LoDir, nLo)
      val (cHi, fHi) = fraction(HiDir, nHi)
      info(f"$label candidates: $cLo (${fLo * 100}%.1f%% of all pairs) -> " +
        f"$cHi (${fHi * 100}%.1f%%), exponent ${exponent(cLo, cHi, nLo, nHi)}%.3f")
      // the fixture's features cluster within ~T, so the fraction is
      // corpus-determined; the GUARD is that it does not grow (a lost
      // band key degrades it toward 100%)
      assert(fHi <= fLo * 1.15,
        f"$label all-pairs fraction grew ${fLo * 100}%.1f%% -> " +
          f"${fHi * 100}%.1f%% — banding is degrading toward all-pairs")
      val (probe, build) = Multimodal.neardupCandidateSides(
        Multimodal.mediaMicroIndexed(spark, HiDir), threshold)
      val budget = joinBudget(probe, build, Seq("band", "ca", "cb"))
      val raw = Multimodal.neardupCandidateJoin(
        Multimodal.mediaMicroIndexed(spark, HiDir), threshold).count()
      info(s"$label raw join rows at hi: $raw (budget $budget)")
      assert(raw <= budget,
        s"$label join rows $raw exceed the per-cell budget $budget")
    }
  }
}
