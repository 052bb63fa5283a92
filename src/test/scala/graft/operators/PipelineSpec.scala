package graft.operators

import org.apache.spark.sql.functions._

import graft.{Catalog, SparkSuite}

/** Composition invariants for the z-family pipelines: survivor-selection
  * semantics (greedy vs connected-component) and the sub-quadratic
  * candidate paths' agreement with the exact baselines.
  */
class PipelineSpec extends SparkSuite {

  test("z3 CC differs from greedy on a chain whose middle node has the largest id") {
    import spark.implicits._
    // pair graph (1,3),(2,3): node 2 never appears as the larger id of a
    // direct pair, so greedy keep-smallest keeps {1, 2}; but 2 is connected
    // to 1 through 3, so connected components keep only {1}
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("da", "db")
    val greedyKeep = Set(1L, 2L) // losers = {db} = {3}
    val cc = Pipeline.ccComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val ccKeep = cc.filter { case (id, root) => id == root }.keySet
    assert(ccKeep == Set(1L))
    assert(ccKeep != greedyKeep, "fixture must prove the two rules differ")
  }

  test("z3 CC propagates the min id across a long transitive chain") {
    import spark.implicits._
    // 91-node path: neighbor propagation alone would need 90 rounds (past
    // the 64-round bound) — pointer jumping must converge it in O(log n)
    val pairs = (10L until 100L).map(i => (i, i + 1)).toDF("da", "db")
    val cc = Pipeline.ccComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.keySet == (10L to 100L).toSet)
    assert(cc.values.toSet == Set(10L), s"all nodes must root at 10: $cc")
  }

  test("z3 CC on two disjoint components roots each at its own min") {
    import spark.implicits._
    val pairs = Seq((5L, 6L), (6L, 7L), (20L, 21L)).toDF("da", "db")
    val cc = Pipeline.ccComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("z3 CC of an empty pair graph is empty") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Pipeline.ccComponents(pairs).count() == 0)
  }

  test("z2 LSH candidate path agrees with exact n2 pairs on the fixture") {
    // the deterministic 16x2 banding has ~3e-4 worst-case per-pair miss at
    // the 0.4 threshold; on the sf0.001 fixture's pair set assert the
    // verified LSH pairs are a subset of the exact pairs and recall is high
    val e = Similarity.nonZeroEmbeddings(spark, sfDir)
    import graft.expressions.VectorFunctions.cosine_sim
    val lshPairs = Similarity
      .lshCandidatePairs(e, Pipeline.Z2Bands, Pipeline.Z2PlanesPerBand)
      .join(e.select(col("vec_id").as("va"), col("embedding").as("ea")), "va")
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb")), "vb")
      .filter(round(cosine_sim(col("ea"), col("eb")), 6)
        >= Similarity.PairThreshold)
      .select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosinePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs.subsetOf(exact), "verified LSH pairs must be true pairs")
    if (exact.nonEmpty)
      assert(lshPairs.size.toDouble / exact.size >= 0.8,
        s"recall ${lshPairs.size}/${exact.size}")
  }

  test("z1 keeps only quality English exact-keeper non-near-dup docs") {
    val out = Pipeline.corpusPipeline(spark, sfDir)
    val ids = out.collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    // spot-check the stages: every survivor passes quality + language
    val q = TextOps.qualityScores(spark, sfDir)
      .filter(col("len_ok")).collect().map(_.getLong(0)).toSet
    val en = TextOps.langId(spark, sfDir)
      .filter(col("detected_lang") === "en").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(q) && ids.subsetOf(en))
    // and no survivor is the larger side of a verified near-dup pair
    val losers = Dedup.minhashLsh(spark, sfDir).collect()
      .map(_.getLong(1)).toSet
    assert((ids & losers).isEmpty)
  }

  test("x5 and z4 agree on every document's shard at a non-default bucket count") {
    // the shard width is a deployment knob (r7 verdict item 6: 100 buckets
    // = 100 single-task cumsums, a gate-scale setting) — prove the split
    // and the packing stay on ONE shard formula when the count changes
    val buckets = 256
    val split = TextOps.splitAssignAt(buckets)(spark, sfDir)
      .select(col("doc_id"), col("bucket").as("sb"), col("split"))
    val pack = Pipeline.sequencePackAt(buckets)(spark, sfDir)
      .select(col("doc_id"), col("bucket").as("pb"), col("n_tokens"), col("seq_id"))
    val joined = split.join(pack, "doc_id").collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getAs[Int]("sb") == r.getAs[Int]("pb")),
      "split and pack disagree on a document's shard bucket")
    // the split fractions scale with the count (80/10/10 of 256)
    joined.foreach { r =>
      val b = r.getAs[Int]("sb")
      assert(b >= 0 && b < buckets)
      val expected =
        if (b < buckets * TextOps.SplitTrainPct / 100) "train"
        else if (b < buckets * (TextOps.SplitTrainPct + TextOps.SplitValPct) / 100) "val"
        else "test"
      assert(r.getAs[String]("split") == expected)
    }
    // and the packing arithmetic holds per shard at this count too
    joined.groupBy(_.getAs[Int]("pb")).foreach { case (_, shard) =>
      var cumBefore = 0L
      shard.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_id") == cumBefore / Pipeline.SeqWindowTokens)
        cumBefore += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("z13 token mix: verdicts match an independent JVM recomputation and " +
    "token-heavy sources thin where doc-count mixing would not") {
    import spark.implicits._
    // source A: 10 long docs (100 tokens); source B: 10 short docs (10
    // tokens). Equal DOC counts — z5 treats them identically; z13 must
    // thin A 10x harder because its TOKEN mass is 10x B's.
    val fixture = ((1L to 10L).map(i => (i, "A", 100L)) ++
      (11L to 20L).map(i => (i, "B", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    val got = Pipeline.tokenMixAcceptOf(fixture).collect()
      .map(_.getLong(0)).toSet

    // independent recomputation: JVM md5 → first 15 hex chars → long,
    // the rule as arithmetic (nothing reused from the engine expression)
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val tok = Map("A" -> 1000L, "B" -> 100L); val minTok = 100L
    val expected = (1L to 20L).filter { id =>
      val src = if (id <= 10) "A" else "B"
      (hash60(s"$id:tokmix") % Pipeline.MixScale) * 100L * tok(src) <
        Pipeline.MixScale * Pipeline.MixBudgetPct * minTok
    }.toSet
    assert(got === expected, s"engine ${got} != recomputed ${expected}")

    // the rates themselves: A's threshold is 10x tighter than B's, while
    // a doc-count rule would give both the same rate (equal doc counts)
    val rateA = Pipeline.MixBudgetPct.toDouble * minTok / (100.0 * tok("A"))
    val rateB = Pipeline.MixBudgetPct.toDouble * minTok / (100.0 * tok("B"))
    assert(rateA * 10 == rateB && rateB == 0.6)
    // and the expected accepted TOKEN mass is equal by construction:
    // rate_s * tok_s = pct * min_tok / 100 for both sources
    assert(rateA * tok("A") == rateB * tok("B"))
  }

  test("z12: no near-dup pair straddles a split; clusters move as one unit") {
    val split = Pipeline.leakageSafeSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    // the property z12 exists for: every d12 pair shares a split
    val pairs = Dedup.jaccardPairsIndexed(spark, sfDir)
      .select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"pair ($a, $b) straddles splits: ${split(a)._2} vs ${split(b)._2}")
    }
    // x5 (doc-keyed) does NOT have this property on the same fixture —
    // z12 must be a real change, not a coincidence of the hash
    val x5 = TextOps.splitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pairs.exists { case (a, b) => x5(a) != x5(b) },
      "fixture never leaks under x5 — the spec proves nothing")
    // unclustered docs keep exactly their x5 split (rep = doc_id)
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.foreach { case (id, (rep, s)) =>
      if (!clustered.contains(id)) {
        assert(rep == id, s"singleton $id must be its own representative")
        assert(s == x5(id), s"singleton $id drifted from the x5 split")
      }
    }
    // split fractions stay sane (the rule is still 80/10/10 by bucket)
    val bySplit = split.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"all three splits must be populated: $bySplit")
    assert(bySplit("train") > bySplit("val") &&
      bySplit("train") > bySplit("test"), s"train must dominate: $bySplit")
  }

  test("shardBucketsFor derives scale-safe counts from corpus size") {
    import graft.operators.TextOps.{shardBucketsFor, PackTaskTokenBudget, ShardBuckets}
    // gate-scale corpora stay on the gate default (oracle SQL pins it)
    assert(shardBucketsFor(1000000L, 4) == ShardBuckets)
    // token mass dominates once the corpus outgrows budget × floor
    assert(shardBucketsFor(10000000000L, 4) ==
      math.ceil(1.0e10 / PackTaskTokenBudget).toInt)
    // a wide cluster floors at 4× parallelism even for a small corpus
    assert(shardBucketsFor(1L, 1000) == 4000)
    // 100 TB-scale (~2×10¹³ tokens, 1000 executors): hundreds of
    // thousands of buckets — the doc's "not 100" made checkable
    assert(shardBucketsFor(20000000000000L, 1000) == 625000)
    // the cap holds (beyond it, raise the budget instead)
    assert(shardBucketsFor(Long.MaxValue, 4) == (1 << 20))
    // monotone in corpus size — growth can only add buckets
    assert(shardBucketsFor(1000000000000L, 32) >=
      shardBucketsFor(100000000000L, 32))
  }

  test("sequencePackAuto derives the count and matches the fixed-count pack") {
    // at fixture scale the derivation floors at the gate default, so the
    // auto path must reproduce z4 exactly (same shard expression, same
    // window arithmetic) — the derivation changes WHEN buckets grow, not
    // what a pack at a given count computes
    val auto = Pipeline.sequencePackAuto(spark, sfDir).collect().toSeq
    val fixed = Pipeline.sequencePack(spark, sfDir).collect().toSeq
    assert(auto.nonEmpty && auto == fixed)
  }

  test("sequencePackAuto packs at a DERIVED non-default count end to end") {
    // simulate a wider cluster: 128-way parallelism floors the derivation
    // at 4×128 = 512 buckets — above the gate default, so this run proves
    // the derived count actually reaches the pack (not just the formula)
    val derived = Pipeline.derivedShardBuckets(spark, sfDir, 128)
    assert(derived == 512, s"expected the 4×parallelism floor, got $derived")
    val auto = Pipeline.sequencePackAuto(spark, sfDir, 128).collect().toSeq
    val fixed = Pipeline.sequencePackAt(derived)(spark, sfDir).collect().toSeq
    assert(auto.nonEmpty && auto == fixed)
    // the non-default count took effect: some document lands in a bucket
    // the 100-bucket default could never produce
    val buckets = auto.map(_.getAs[Int]("bucket"))
    assert(buckets.forall(b => b >= 0 && b < derived))
    assert(buckets.exists(_ >= TextOps.ShardBuckets),
      "every bucket id is below the default count — the derived count did not reach the shard expression")
    // and the split formula agrees with the pack at the derived count too
    val split = TextOps.splitAssignAt(derived)(spark, sfDir)
      .select(col("doc_id"), col("bucket").as("sb"))
    val pack = Pipeline.sequencePackAt(derived)(spark, sfDir)
      .select(col("doc_id"), col("bucket").as("pb"))
    assert(split.join(pack, "doc_id").collect()
      .forall(r => r.getAs[Int]("sb") == r.getAs[Int]("pb")))
  }

  test("sequencePackAuto survives an empty and an all-NULL-text corpus") {
    // ADVICE r9: the token-total pre-pass sums to NULL on these shapes;
    // the deployment entry must clamp to the gate default, not NPE
    val tmp = java.nio.file.Files.createTempDirectory("graft-pack-empty").toString
    val docs = Catalog.documents(spark, sfDir)
    docs.limit(0).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Pipeline.derivedShardBuckets(spark, tmp, 4) == TextOps.ShardBuckets)
    assert(Pipeline.sequencePackAuto(spark, tmp).collect().isEmpty)
    val nulls = java.nio.file.Files.createTempDirectory("graft-pack-null").toString
    docs.limit(3).withColumn("text", lit(null).cast("string"))
      .write.mode("overwrite").parquet(s"$nulls/documents.parquet")
    assert(Pipeline.derivedShardBuckets(spark, nulls, 4) == TextOps.ShardBuckets)
    Pipeline.sequencePackAuto(spark, nulls).collect()
  }

  test("z9 curriculum: deciles partition the corpus, rates rise, top keeps all") {
    val rows = Pipeline.curriculumSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L until 10L))
    val nonNull = Catalog.documents(spark, sfDir)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._2).sum == nonNull, "deciles must partition the corpus")
    // the top decile's threshold is 1000/1000 — every document kept
    val top = rows.last
    assert(top._3 == top._2 && top._4 > 0)
    // rate envelope: each decile's keep fraction within ±0.25 of its
    // nominal (d+1)/10 (hash-Bernoulli at these stratum sizes)
    rows.foreach { case (d, n, kept, _) =>
      if (n >= 20)
        assert(math.abs(kept.toDouble / n - (d + 1) / 10.0) < 0.25,
          s"decile $d: kept $kept of $n")
    }
    // deterministic: a second run is bit-identical
    assert(Pipeline.curriculumSample(spark, sfDir).collect().toSeq
      .map(_.toString) == rows.toSeq.map(r =>
        s"[${r._1},${r._2},${r._3},${r._4}]"))
  }

  test("z4 packing equals an independent per-shard prefix-sum recomputation") {
    val rows = Pipeline.sequencePack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, shard) =>
      val inOrder = shard.sortBy(_._1)
      var cumBefore = 0L
      inOrder.foreach { case (id, _, nTokens, seqId) =>
        assert(seqId == cumBefore / Pipeline.SeqWindowTokens,
          s"doc $id: seq $seqId != ${cumBefore / Pipeline.SeqWindowTokens}")
        cumBefore += nTokens
      }
      assert(inOrder.head._4 == 0L, "each shard's first doc starts sequence 0")
    }
  }

  // ---------------------------------------------------------------------
  // z11 — drop audit
  // ---------------------------------------------------------------------

  // 20 tokens, unambiguously English markers, no de/es/fr markers
  private val EnBase = "the cat sat on the mat and the dog is " +
    "happy to see it all of the time right now"

  test("z11 attributes every drop to its FIRST failing stage, with dup pointers") {
    import spark.implicits._
    val docs = Seq(
      1L -> Option(EnBase),                       // kept
      2L -> Option("  " + EnBase.replace(" ", "  ") + " "), // ws-variant: exact dup of 1
      3L -> Option("too short"),                  // quality
      4L -> Option("der hund und die katze ist nicht hier und der mann " +
        "ist nicht da und die frau ist nicht froh"), // language (de)
      5L -> Option.empty[String],                 // NULL text → quality
      6L -> Option(EnBase + " yes indeed"),       // near-dup of 1 (via pairs)
      7L -> Option("short near dup"))             // quality AND near-dup → quality
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 6L), (1L, 7L)).toDF("da", "db")
    val got = Pipeline.dropAuditOf(docs, pairs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got === Map(
      1L -> (("kept", -1L)),
      2L -> (("exact_dup", 1L)),
      3L -> (("quality", -1L)),
      4L -> (("language", -1L)),
      5L -> (("quality", -1L)),
      6L -> (("near_dup", 1L)),
      7L -> (("quality", -1L))))
  }

  test("z11 near-dup partner is the SMALLEST partner across pairs") {
    import spark.implicits._
    val docs = Seq(
      1L -> EnBase, 2L -> (EnBase + " one more"), 3L -> (EnBase + " yes indeed"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("da", "db")
    val got = Pipeline.dropAuditOf(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupOf = Pipeline.dropAuditOf(docs, pairs)
      .filter(col("doc_id") === 3L).collect().head.getLong(2)
    assert(got(3L) === "near_dup" && dupOf === 1L)
  }

  test("z11 'kept' verdicts reproduce z1's output exactly, and drops are non-vacuous") {
    val kept = Pipeline.dropAudit(spark, sfDir)
      .filter(col("verdict") === "kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val z1 = Pipeline.corpusPipeline(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(kept === z1, "audit and pipeline drifted")
    val verdicts = Pipeline.dropAudit(spark, sfDir)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("quality", "language", "near_dup").foreach(v =>
      assert(verdicts.getOrElse(v, 0L) > 0L, s"no '$v' drops — vacuous fixture"))
  }

  test("z17 packing efficiency reconciles exactly with z4's assignment") {
    import org.apache.spark.sql.functions.col
    val packed = Pipeline.sequencePack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val report = Pipeline.packEfficiency(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val byBucket = packed.groupBy(_._2)
    assert(report.keySet === byBucket.keySet, "one report row per shard")
    byBucket.foreach { case (b, rows) =>
      val (nDocs, nSeqs, total, capacity, fill) = report(b)
      assert(nDocs === rows.length.toLong)
      assert(nSeqs === rows.flatMap(_._4).distinct.length.toLong)
      assert(total === rows.map(_._3).sum)
      assert(capacity === nSeqs * Pipeline.SeqWindowTokens)
      assert(fill === 1000000L * total / capacity,
        s"shard $b fill_ppm drifted from the integer identity")
    }
    // the report is non-vacuous in the direction that matters: at least
    // one shard overflows (fill > 1e6) OR underfills — a constant 1e6
    // everywhere would mean the stat carries no signal on this corpus
    assert(report.values.exists(_._5 != 1000000L))
  }
}
