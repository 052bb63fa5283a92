package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** z4b FFD no-split packing (round-12 verdict item #8): measured fill
  * improvement over the next-fit baseline on the fixture, no-overflow
  * for multi-doc bins, determinism, and token-accounting identity with
  * z4's packed relation. z4 itself is untouched — the stream regime
  * (documents cross window boundaries) keeps its cumulative-sum form.
  */
class PackFfdSpec extends SparkSuite {

  private val W = Pipeline.SeqWindowTokens

  test("hand shard: FFD back-fills behind the big items where next-fit " +
      "strands capacity") {
    import spark.implicits._
    // one bucket, window 2048: items 1200, 1100, 900, 800, 60, 40.
    // next-fit (doc_id order = as listed): [1200+800+40], [1100+900+60]
    //   — contrived-lucky orders exist; use an order where NF wastes:
    // doc order: 1200, 1100, 900, 800, 60, 40
    //   NF: bin0 1200 (1100 doesn't fit) -> bin1 1100+900 -> 800 doesn't
    //   fit bin1 -> bin2 800+60+40 = 900. 3 bins, 4100 tokens.
    // FFD (desc): 1200+800+40=2040 | 1100+900+60=2040? 900 fits 1100's
    //   bin (2000), 800 fits 1200's (2000), 60 -> 1200-bin (2060 > 2048?
    //   no: 2000+60=2060 > 2048, so 60 -> 1100-bin 2060? also > 2048 ->
    //   wait 1100+900=2000, +60=2060 > 2048 -> new bin? Recompute:
    //   sizes desc: 1200, 1100, 900, 800, 60, 40
    //   b0=1200; 1100->b1; 900->b1 (2000); 800->b0 (2000); 60: b0 2060x,
    //   b1 2060x -> b2=60; 40: b0 2040, fits -> b0=2040. 3 bins too but
    //   loads (2040, 2000, 60). Both 3 bins here — assert the INVARIANTS
    //   (placement, no overflow), leave the fill delta to the fixture
    //   test where the distribution is real.
    val docs = Seq((1L, 0, 1200L), (2L, 0, 1100L), (3L, 0, 900L),
      (4L, 0, 800L), (5L, 0, 60L), (6L, 0, 40L))
      .toDF("doc_id", "bucket", "n_tokens")
    val ffd = Pipeline.packBinsFfdOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // deterministic FFD placement trace from the comment above
    assert(ffd === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 2L, 6L -> 0L), s"FFD placement diverged: $ffd")
    // no multi-doc bin exceeds the window
    val loads = Pipeline.packBinsFfdOf(docs).groupBy("seq_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("n"))
      .collect()
    loads.foreach { r =>
      assert(r.getLong(1) <= W || r.getLong(2) == 1L,
        s"multi-doc bin over capacity: $r")
    }
  }

  test("oversized documents get a bin of their own (visible overflow, " +
      "never co-packed)") {
    import spark.implicits._
    val docs = Seq((1L, 0, 5000L), (2L, 0, 100L), (3L, 0, 100L))
      .toDF("doc_id", "bucket", "n_tokens")
    val byBin = Pipeline.packBinsFfdOf(docs).collect()
      .groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byBin.values.exists(_ === Set(1L)),
      s"oversized doc must sit alone: $byBin")
    assert(byBin.values.exists(_ === Set(2L, 3L)),
      s"small docs must co-pack: $byBin")
  }

  test("z18 gate accounting on hand shards: oversized docs drive the " +
      "engine-vs-oracle n_oversized cross-check non-degenerately, and " +
      "every claim boolean holds") {
    import spark.implicits._
    // bucket 0: two oversized docs (the fixture has none at the gate
    // window, so the gate's sharpest check is 0==0 there — round-14
    // review) + small docs; bucket 1: small docs only
    val docs = Seq(
      (1L, 0, 200L), (2L, 0, 150L), (3L, 0, 60L), (4L, 0, 60L),
      (5L, 0, 30L),
      (6L, 1, 64L), (7L, 1, 64L), (8L, 1, 52L))
      .toDF("doc_id", "bucket", "n_tokens")
    val got = Pipeline.packFfdGateOf(docs, 128L).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7)))).toMap
    // bucket 0: 5 docs, 500 tokens, 2 oversized BINS (the kernel isolated
    // each over-window doc) — engine-side n_oversized equals the
    // data-side doc count the oracle would emit
    assert(got(0) === ((5L, 500L, 2L, true, true, true, true)), s"$got")
    assert(got(1) === ((3L, 180L, 0L, true, true, true, true)), s"$got")
  }

  test("ffd_le_nextfit is NOT a theorem (why the gate doesn't pin it): a " +
      "lucky arrival order lets next-fit beat FFD") {
    import spark.implicits._
    // round-14 review counterexample, window 128, doc_id order:
    // NF packs {64,64},{52,38,38},{52,38,38} = 3 bins;
    // FFD (sorted 64,64,52,52,38,38,38,38) packs
    // {64,64},{52,52},{38,38,38},{38} = 4 bins
    val docs = Seq(
      (1L, 0, 64L), (2L, 0, 64L), (3L, 0, 52L), (4L, 0, 38L),
      (5L, 0, 38L), (6L, 0, 52L), (7L, 0, 38L), (8L, 0, 38L))
      .toDF("doc_id", "bucket", "n_tokens")
    def bins(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("seq_id")).distinct().count()
    val nf = bins(Pipeline.packBinsOf(docs, decreasing = false, 128L))
    val ffd = bins(Pipeline.packBinsOf(docs, decreasing = true, 128L))
    assert(nf === 3L && ffd === 4L,
      s"the counterexample must reproduce: nf=$nf ffd=$ffd")
    // ...and the SOUND bounds still hold on it: 2 <= ffd <= 7
    val row = Pipeline.packFfdGateOf(docs, 128L).collect().head
    assert(row.getBoolean(6) && row.getBoolean(7),
      s"volume/half-full bounds must hold on the counterexample: $row")
  }

  test("fixture: measured fill — FFD improves on the next-fit no-split " +
      "baseline, and neither regime's accounting drops a token") {
    // the fixture's documents run 10-99 tokens, so the no-split regime
    // bites at a window INSIDE that band (at z4's 2048 every bucket is
    // one under-full bin under any algorithm and the comparison is
    // vacuous — measured: both 136420 ppm)
    val Win = 128L
    val ffd = Pipeline.packBinsFfd(spark, sfDir, Win)
    val nf = Pipeline.packBinsNextFit(spark, sfDir, Win)
    val fillFfd = Pipeline.fillPpmOf(ffd, Win)
    val fillNf = Pipeline.fillPpmOf(nf, Win)
    info(s"fixture fill_ppm at window $Win: ffd=$fillFfd next_fit=$fillNf " +
      s"delta=${fillFfd - fillNf}")
    // measured on the sf0.001 fixture: ffd=752667, next_fit=690738 —
    // a 61,929 ppm (6.2-point) fill gain from the same token mass
    assert(fillFfd > fillNf,
      s"FFD fill $fillFfd must beat next-fit $fillNf on the fixture")
    // token-accounting identity with z4: same doc set, same per-bucket
    // token masses — the packing permutes, never drops
    val z4 = Pipeline.sequencePack(spark, sfDir)
      .groupBy("bucket").agg(sum("n_tokens").as("toks"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ffdAcc = ffd.groupBy("bucket").agg(sum("n_tokens").as("toks"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ffdAcc === z4,
      "per-bucket (token mass, doc count) must match z4's packed relation")
    // no multi-doc bin over capacity at fixture scale either
    val over = ffd.groupBy("bucket", "seq_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("n"))
      .filter(col("load") > Win && col("n") > 1).count()
    assert(over === 0L, s"$over multi-doc FFD bins over capacity")
    // determinism: a second run reproduces the assignment bit-for-bit
    val a = ffd.collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val b = Pipeline.packBinsFfd(spark, sfDir, Win).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(a == b)
  }
}
