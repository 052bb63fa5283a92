package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Behavior of the corpus-assembly extensions added in round 8:
  * x7 benchmark decontamination and z5 source mixing.
  */
class MixDecontamSpec extends SparkSuite {

  test("n8 flags corpus vectors by max cosine against ANY eval vector") {
    import spark.implicits._
    // eval slice: axis vectors e0=[1,0], e1=[0,1]. corpus:
    //  - 50 duplicates e0 (max cosine 1.0 — contamination)
    //  - 51 is 45° between them (cos ≈ 0.707107 to both)
    //  - 52 is -e0: cosine -1 vs e0, 0 vs e1 → max 0.0, below τ → absent
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (50L, Seq(1f, 0f)), (51L, Seq(1f, 1f)), (52L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontamOf(emb, evalMax = 50, tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // ordered best-first; 45° rounds to 0.707107 at 6 dp
    assert(out.toSeq == Seq((50L, 1.0), (51L, 0.707107)))
  }

  test("x7 counts distinct shared shingles vs the eval slice and flags at the threshold") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-decontam").toString
    // doc 50 is an EVAL doc (id % 50 == 0). Build train docs with a known
    // number of shared 3-shingles against it:
    //  - doc 51 contains a 7-token verbatim quote => 5 shared shingles
    //    (flagged at ContamMinShared = 5)
    //  - doc 52 contains a 5-token quote => 3 shared shingles (reported,
    //    below the flag threshold)
    //  - doc 53 shares no shingles (absent from the output entirely)
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (50L, evalText),
      (51L, "intro words then alpha beta gamma delta epsilon zeta eta closing"),
      (52L, "other stuff alpha beta gamma delta epsilon trailing tokens here"),
      (53L, "completely disjoint vocabulary nothing shared with the suite"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.decontaminate(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(!out.contains(50L), "eval docs must not appear in the output")
    assert(!out.contains(53L), "a doc sharing nothing must not appear")
    assert(out(51L) == ((5L, true)),
      s"7-token quote = 5 shared shingles, flagged; got ${out.get(51L)}")
    assert(out(52L) == ((3L, false)),
      s"5-token quote = 3 shared shingles, unflagged; got ${out.get(52L)}")

    // the deployment surface — an EXTERNAL eval corpus — must report the
    // identical overlaps when handed the same suite explicitly
    val tmp2 = Files.createTempDirectory("graft-decontam-ext").toString
    docs.filter(_._1 != 50L).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val evalDf = Seq((50L, evalText)).toDF("doc_id", "text")
    val ext = Dedup.decontaminateAgainst(evalDf)(spark, tmp2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(ext == out,
      s"explicit-eval deployment form diverged from the slice form: $ext vs $out")
  }

  test("x13 attributes contamination per EVAL item, diverging from x7 where it must") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-contamrep").toString
    // eval 0: shingles {abc,bcd,cde,def,efg}; eval 50: {pqr,qrs,rst,stu,tuv}
    //  - train 1 duplicates eval 0 verbatim → pair share 5 (compromising)
    //  - train 2 quotes 5 tokens of eval 0 → pair share 3 (overlap only)
    //  - train 3 quotes 5 tokens of EACH eval item → per-pair 3 and 3,
    //    but x7's SET-level total is 6 ≥ 5: x7 flags the train doc while
    //    NO single eval item is compromised by it — the exact divergence
    //    the per-item report exists to expose
    val docs = Seq(
      (0L, "a b c d e f g"),
      (50L, "p q r s t u v"),
      (1L, "a b c d e f g"),
      (2L, "quote of a b c d e ends here now"),
      (3L, "a b c d e and then p q r s t"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rep = Dedup.contamReport(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep(0L) == ((3L, 1L, 5L)),
      s"eval 0: 3 overlapping, 1 compromising (the verbatim dup), worst 5; got ${rep.get(0L)}")
    assert(rep(50L) == ((1L, 0L, 3L)),
      s"eval 50: only train 3 overlaps, below threshold; got ${rep.get(50L)}")
    // and x7 on the same corpus DOES flag train 3 (set-level total 6)
    val x7 = Dedup.decontaminate(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(x7(3L), "x7 must flag the doc whose set-level total crosses the threshold")
    assert(x7(1L) && !x7(2L))
  }

  test("z5 acceptance equals the integer-arithmetic mirror, per source, deterministically") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mix").toString
    // skewed corpus: srcA 3x the size of srcB — the fixture's sources are
    // perfectly balanced, so the per-source rate scaling is proven here
    val docs = (1 to 90).map(i => (i.toLong, s"doc number $i body", "srcA")) ++
      (91 to 120).map(i => (i.toLong, s"doc number $i body", "srcB"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val accepted = Pipeline.sourceMixSample(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // mirror: recompute the acceptance decision in the driver from the
    // engine's own hash values and the documented integer compare
    val hmods = spark.range(1, 121)
      .select(col("id"),
        pmod(TextOps.hash60(concat(col("id").cast("string"), lit(":mix"))),
          lit(Pipeline.MixScale)).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cnt = Map("srcA" -> 90L, "srcB" -> 30L)
    val minCnt = 30L
    val expected = docs.collect {
      case (id, _, src)
          if hmods(id) * 100L * cnt(src) <
            Pipeline.MixScale * Pipeline.MixBudgetPct * minCnt =>
        (id, src)
    }
    assert(accepted.toSeq.sorted == expected.sorted)
    // per-source rates scale inversely with size: srcA accepts ~20% of 90,
    // srcB ~60% of 30 — both target ~18 docs. Loose band: the decision is
    // a fixed hash, so this only guards against a degenerate all/none
    val bySrc = accepted.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("srcA", 0) > 0 && bySrc.getOrElse("srcB", 0) > 0)
    assert(bySrc("srcA") < 90 && bySrc("srcB") < 30,
      s"budget must downsample both sources, got $bySrc")
    // determinism: a second run returns the identical relation
    val again = Pipeline.sourceMixSample(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq == accepted.toSeq)
  }

  test("z10 temperature mix: squared-integer mirror, sqrt scaling, min-source anchor") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-tmix").toString
    // skewed corpus: srcA 3x srcB, so the sqrt flattening is visible
    val docs = (1 to 90).map(i => (i.toLong, s"doc number $i body", "srcA")) ++
      (91 to 120).map(i => (i.toLong, s"doc number $i body", "srcB"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val accepted = Pipeline.temperatureMixSample(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // mirror the squared compare in driver-side BigInt off the engine's
    // own hash values — the decision must be bit-identical
    val hmods = spark.range(1, 121)
      .select(col("id"),
        pmod(TextOps.hash60(concat(col("id").cast("string"), lit(":tmix"))),
          lit(Pipeline.MixScale)).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cnt = Map("srcA" -> 90L, "srcB" -> 30L)
    val minCnt = 30L
    val s = Pipeline.MixScale
    val pct = Pipeline.MixBudgetPct
    val expected = docs.collect {
      case (id, _, src)
          if BigInt(hmods(id)) * hmods(id) * s * cnt(src) <
            BigInt(s) * s * pct * pct * minCnt =>
        (id, src)
    }
    assert(accepted.toSeq.sorted == expected.sorted)
    // the smallest source reduces EXACTLY to z5's rule: cnt = min_cnt
    // collapses the squared compare to h < S·pct/100
    val minAccepted = accepted.collect { case (id, "srcB") => id }.toSet
    val minExpected = (91L to 120L).filter(hmods(_) < s * pct / 100).toSet
    assert(minAccepted == minExpected,
      "min source must accept at exactly the z5 budget rate")
    // sqrt flattening on the large source: strictly more than z5's equal
    // share (~20% of 90 = 18 target) and strictly fewer than the uniform
    // 60% (54) — expectation is 60%·sqrt(30/90)·90 ≈ 31
    val bigAccepted = accepted.count(_._2 == "srcA")
    val z5Big = Pipeline.sourceMixSample(spark, tmp).collect()
      .count(_.getString(1) == "srcA")
    assert(bigAccepted > z5Big,
      s"temperature must keep more of the big source than balanced z5 ($bigAccepted vs $z5Big)")
    assert(bigAccepted < 54,
      s"temperature must still downsample the big source below uniform 60% ($bigAccepted)")
    // determinism: the coin is a fixed hash
    val again = Pipeline.temperatureMixSample(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq == accepted.toSeq)
  }

  test("weighted z5 reduces to balanced z5 under equal weights at the default budget") {
    // the deployment API and the registered gate query must be the SAME
    // formula: equal weights = balanced mixing
    val balanced = Pipeline.sourceMixSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val sources = graft.Catalog.documents(spark, sfDir)
      .select(col("source")).distinct().collect().map(_.getString(0))
    val weighted = Pipeline.sourceMixSampleWeighted(
      sources.map(_ -> 7L).toMap)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(weighted == balanced)
  }

  test("z6 composes its stages consistently with x7/x5/z4 run standalone") {
    val rows = Pipeline.assemblyPipeline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0)).toSet
    // stage 1: no eval doc and no flagged doc survives
    assert(!ids.exists(_ % Dedup.ContamEvalMod == 0),
      "eval-slice docs must not reach the assembled corpus")
    val flagged = Dedup.decontaminate(spark, sfDir)
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    assert((ids & flagged).isEmpty, "x7-flagged docs must be dropped")
    // stage 3: bucket and split agree with x5's standalone assignment
    val x5 = TextOps.splitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    rows.foreach { r =>
      assert(x5(r.getLong(0)) == ((r.getInt(2), r.getString(3))),
        s"doc ${r.getLong(0)}: assembly (bucket, split) diverged from x5")
    }
    // stage 4: the packing cumsum holds over the ACCEPTED set per bucket
    rows.groupBy(_.getInt(2)).foreach { case (_, shard) =>
      var cum = 0L
      shard.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(5) == cum / Pipeline.SeqWindowTokens)
        cum += r.getLong(4)
      }
    }
  }

  test("weighted z5 honors an asymmetric weight table and drops unweighted sources") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mixw").toString
    // srcA:srcB target 3:1; srcC carries no weight (omitted from the mix)
    val docs = (1 to 80).map(i => (i.toLong, s"w doc $i", "srcA")) ++
      (81 to 160).map(i => (i.toLong, s"w doc $i", "srcB")) ++
      (161 to 200).map(i => (i.toLong, s"w doc $i", "srcC"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val weights = Map("srcA" -> 3L, "srcB" -> 1L)
    val out = Pipeline.sourceMixSampleWeighted(weights, budgetPct = 100L)(
      spark, tmp).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!out.exists(_._2 == "srcC"), "unweighted sources must be dropped")
    // binding source: cnt/w — srcA 80/3 ≈ 26.7 < srcB 80/1 → srcA fully
    // consumed at 100% budget (threshold caps at rate 1.0)
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("srcA") == 80, s"binding source must be fully accepted, got $bySrc")
    // mirror srcB's threshold exactly: ceil(S·100·w_B·cnt_A / (100·cnt_B·w_A))
    val s = Pipeline.MixScale
    val thrB = (BigInt(s) * 100 * 1 * 80 + (BigInt(100) * 80 * 3 - 1)) /
      (BigInt(100) * 80 * 3)
    val hmods = spark.range(81, 161)
      .select(col("id"),
        pmod(TextOps.hash60(concat(col("id").cast("string"), lit(":mix"))),
          lit(s)).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectB = (81L to 160L).filter(id => hmods(id) < thrB.toLong)
    assert(out.filter(_._2 == "srcB").map(_._1).toSeq.sorted == expectB,
      "srcB acceptance must equal the exact ceil-threshold mirror")
  }
}
