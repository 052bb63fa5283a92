package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BM25 ranking semantics on hand-built corpora: tf saturation, idf
  * weighting, length normalization, and the exact integer arithmetic of
  * one fully hand-computed score.
  */
class SearchSpec extends SparkSuite {

  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("b14 fuzzy terms: every edit class resolves, the transposition is " +
    "candidate-surfaced but verify-rejected, ties break by frequency") {
    val got = Search.fuzzyTerms(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(got.keySet === Search.FuzzyProbes.toSet, "one row per probe")
    assert(got("filtr") === ((Some("filter"), 1L)), "deletion typo")
    assert(got("windoww") === ((Some("window"), 1L)), "insertion typo")
    assert(got("quer") === ((Some("query"), 1L)), "truncation typo")
    assert(got("hash") === ((Some("hash"), 0L)), "exact term at distance 0")
    // 'sprak' is a transposition of 'spark' (distance 2): the deletion
    // neighborhoods intersect (both contain 'spak'), so the CANDIDATE
    // surfaces — the exact-levenshtein verify must reject it
    assert(got("sprak") === ((None, -1L)), "transposition must not match")
    assert(got("zzzz") === ((None, -1L)), "no-candidate miss")
    // 'sow' is distance 1 from BOTH 'row' and 'slow' — the more frequent
    // fixture term wins (row at sf0.001 fixture frequencies)
    val sowPick = got("sow")._1.get
    assert(Set("row", "slow").contains(sowPick))
  }

  test("a fully hand-computed score: one term, uniform doc lengths") {
    // corpus: 4 docs, 2 tokens each -> N=4, T=8, dl=2
    // query term "x": doc 1 has tf=2, doc 2 tf=1, docs 3-4 none -> df=2
    val docs = corpus(
      (1L, "x x"), (2L, "x y"), (3L, "y y"), (4L, "z z"))
    val got = Search.bm25Of(docs, Seq("x"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // idf_bits = bitlength((2N+2) div (2df+1)) - 1 = bitlength(10 div 5)-1
    //          = bitlength(2)-1 = 1
    // tf_norm(tf) = 22*tf*T / (10*tf*T + 3*T + 9*dl*N)
    //   tf=2: 352 / (160+24+72=256) = 1.375        -> 1375000 ppm
    //   tf=1: 176 / (80+24+72=176)  = 1.0          -> 1000000 ppm
    assert(got.toSeq == Seq((1L, 1L, 1375000L), (2L, 1L, 1000000L)))
  }

  test("rarer terms outweigh common ones at equal tf") {
    // "rare" appears in 1 of 8 docs, "common" in all 8; probe docs have
    // each term exactly once at the same doc length
    val filler = (10L to 15L).map(i => (i, "common pad"))
    val docs = corpus(Seq((1L, "rare pad"), (2L, "common pad")) ++ filler: _*)
    val scores = Search.bm25Of(docs, Seq("rare", "common"), 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L),
      s"rare-term doc must outrank common-term doc: $scores")
  }

  test("longer documents score lower at equal tf (length normalization)") {
    // enough non-matching filler that idf_bits > 0 (df=2 of N=8:
    // (2N+2) div (2df+1) = 18 div 5 = 3 -> 1 bit)
    val docs = corpus(
      Seq((1L, "x pad"),
        (2L, "x pad pad pad pad pad pad pad")) ++
        (3L to 8L).map(i => (i, "y y")): _*)
    val scores = Search.bm25Of(docs, Seq("x"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("tf saturates: the second occurrence adds less than the first") {
    // df=3 of N=7 -> (2N+2) div (2df+1) = 16 div 7 = 2 -> 1 idf bit
    val docs = corpus(
      Seq((1L, "x a b c"), (2L, "x x b c"), (3L, "x x x c")) ++
        (4L to 7L).map(i => (i, "d d d d")): _*)
    val s = Search.bm25Of(docs, Seq("x"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(3L) > s(2L) && s(2L) > s(1L))
    assert(s(2L) - s(1L) > s(3L) - s(2L),
      s"marginal gain must shrink with tf: $s")
  }

  test("top-k cuts by score then doc_id; docs matching no term are absent") {
    val docs = corpus(
      (5L, "x a"), (3L, "x a"), (4L, "x a"), (9L, "b b"), (8L, "c c"))
    val got = Search.bm25Of(docs, Seq("x"), 2).collect().map(_.getLong(0))
    // identical scores -> doc_id ascending breaks the tie deterministically
    assert(got.toSeq == Seq(3L, 4L))
  }

  test("b2 serves b1's exact rows from the persisted index, with the term filter pushed") {
    val direct = Search.bm25TopK(spark, sfDir).collect().toSeq
    val indexed = Search.bm25Indexed(spark, sfDir)
    assert(indexed.collect().toSeq == direct,
      "the index is derived state — indexed retrieval must equal the direct form")
    // the probe terms must reach the postings scan as a pushed In filter
    // (that is the whole point of the term-sorted layout)
    val scan = indexed.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [In(tok"),
      s"tok IN (…) not pushed to the postings scan:\n$scan")
  }

  test("b3 batch equals per-query single runs and rides the postings index") {
    // every query's batch slice must equal its own single-query run —
    // batching is an execution optimization, never a semantics change
    // (the df of a term shared across queries must not double-count)
    val batch = Search.bm25Batch(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet == Search.BatchQueries.map(_._1).toSet)
    Search.BatchQueries.foreach { case (qid, terms) =>
      val single = Search.bm25Of(graft.Catalog.documents(spark, sfDir),
          terms, Search.TopK).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val slice = batch(qid).sortBy(_.getLong(4))
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(slice == single, s"batch slice for query $qid diverges")
    }
    // ranks are 1..k dense per query
    batch.values.foreach { rows =>
      assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val plan = Search.bm25Batch(spark, sfDir).queryExecution.executedPlan.toString
    // the batch's distinct terms push to the postings scan...
    assert(plan.contains("PushedFilters: [In(tok"),
      s"batch terms not pushed to the postings scan:\n$plan")
    // ...and the per-query top-k is a WindowGroupLimit rank cut, not a
    // global sort of all scored (query, doc) pairs
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must plan as WindowGroupLimit:\n$plan")
  }

  test("bm25BatchOf restricts shared work to distinct terms on an ad-hoc corpus") {
    val docs = corpus(
      (1L, "x y"), (2L, "x a"), (3L, "y a"), (4L, "b b"))
    val probes = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("query_id", "tok")
    val got = Search.bm25BatchOf(docs, probes, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q1 = Search.bm25Of(docs, Seq("x", "y"), 10).collect()
      .map(r => (1L, r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q2 = Search.bm25Of(docs, Seq("x"), 10).collect()
      .map(r => (2L, r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.filter(_._1 == 1L).toSeq == q1 && got.filter(_._1 == 2L).toSeq == q2)
    // a DUPLICATE probe row must not double the term's contribution —
    // the single-query form dedupes via isin, the batch must match it
    val dupProbes = Seq((2L, "x"), (2L, "x")).toDF("query_id", "tok")
    val dup = Search.bm25BatchOf(docs, dupProbes, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(dup == q2, s"duplicate probe row changed scores: $dup vs $q2")
  }

  test("multi-term scores sum per-term contributions; n_terms_matched counts terms") {
    val docs = corpus(
      (1L, "x y"), (2L, "x a"), (3L, "y a"), (4L, "b b"))
    val got = Search.bm25Of(docs, Seq("x", "y"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 2L && byId(2L)._2 == 1L && byId(3L)._2 == 1L)
    // x and y are symmetric here (same df, same tf, same dl), so doc 1's
    // score is exactly the sum of the single-term docs' scores
    assert(byId(1L)._3 == byId(2L)._3 + byId(3L)._3)
    assert(!byId.contains(4L))
  }

  test("b10 MLT selects discriminative terms, ranks the sharer, excludes the probe") {
    // probe 1 carries two rare terms + two stopwords; doc 2 shares the
    // rares, doc 3 only the stopwords; docs 4-10 make alpha/beta common
    val docs = corpus((Seq(
      (1L, "alpha beta rare1 rare2"),
      (2L, "rare1 rare2 gamma"),
      (3L, "alpha beta gamma")) ++
      (4L to 10L).map(i => (i, "alpha beta"))): _*)
    val got = Search.moreLikeThisOf(docs, 1L, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // selection: rare1/rare2 (idf_bits 2, w=2) beat alpha/beta (0 bits);
    // only doc 2 matches a selected term -> it is the ONLY related doc,
    // and the probe itself never appears
    assert(got.map(_._1).toSeq == Seq(2L), s"got ${got.toSeq}")
    assert(got.head._2 == 2L && got.head._3 > 0L, s"got ${got.head}")
  }

  test("b10 indexed two-phase form equals the direct form on the fixture corpus") {
    val direct = Search.moreLikeThisOf(
      graft.Catalog.documents(spark, sfDir),
      Search.MltProbeDoc, Search.MltTerms, Search.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val indexed = Search.moreLikeThis(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(direct == indexed, s"direct $direct != indexed $indexed")
  }

  test("b4 phrase: consecutive-only, multi-occurrence, overlap, repeated-word") {
    val docs = Seq(
      (1L, "a table scan here"),           // one occurrence
      (2L, "scan table"),                  // reversed -> no match
      (3L, "table then scan"),             // gap -> no match
      (4L, "table scan and table scan"),   // two occurrences
      (5L, "table table scan"),            // anchor overlap -> one
      (6L, "nothing relevant"))
      .toDF("doc_id", "text")
    val got = Search.phraseSearchOf(docs, Seq("table", "scan")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 4L -> 2L, 5L -> 1L))
    // repeated-word phrase: overlapping occurrences each count
    val rep = Search.phraseSearchOf(
      Seq((1L, "scan scan scan")).toDF("doc_id", "text"), Seq("scan", "scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(1L -> 2L))
  }

  test("b7 hybrid RRF: hand-computed fusion, full-outer arms, integer points") {
    val docs = corpus(
      (0L, "pad"),
      (1L, "x x pad pad"),   // lex rank 1
      (2L, "x pad pad pad"), // lex rank 2
      (3L, "pad pad"))       // lex absent
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),      // the query vector
      (1L, Seq(0.9f, 0.1f)),      // sem rank 2 (cos ≈ 0.9938)
      (2L, Seq(0.0f, 1.0f)),      // cos 0 -> cut by depth 2
      (3L, Seq(1.0f, 0.001f)))    // sem rank 1 (cos ≈ 1.0)
      .toDF("vec_id", "embedding")
    val got = Search.hybridRrfOf(docs, emb, Seq("x"), 0L, 2, 10).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 1000000 div 61 = 16393, div 62 = 16129
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 2L, 32522L),   // both arms
      (3L, -1L, 1L, 1L, 16393L),  // semantic only -> lex_rank NULL
      (2L, 2L, -1L, 1L, 16129L)), // lexical only -> sem_rank NULL
      s"got ${got.toSeq}")
  }

  test("b6 boolean: MUST-all and MUST-NOT select docs; scoring stays b1's") {
    val docs = corpus(
      (1L, "x y pad"),       // both musts -> eligible
      (2L, "x pad pad"),     // missing y -> out
      (3L, "y pad pad"),     // missing x -> out
      (4L, "x y bad"),       // both musts but must-not -> out
      (5L, "x y x pad"),     // eligible, higher tf(x)
      (6L, "bad pad pad"))   // nothing
    val got = Search.booleanSearchOf(docs, Seq("x", "y"), Seq("bad"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == Set(1L, 5L), s"eligibility wrong: ${got.toSeq}")
    // boolean filtering is SELECTION only: each eligible doc's score must
    // equal what plain BM25 over the must terms gives it (corpus df — the
    // excluded docs 2/3/4 still count into df(x)/df(y))
    val b1 = Search.bm25Of(docs, Seq("x", "y"), 100).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (id, nt, ppm) =>
      assert((nt, ppm) == b1(id),
        s"doc $id: boolean form rescored the corpus: ($nt,$ppm) vs ${b1(id)}")
    }
    // a doc carrying ONLY must-not terms never blocks others
    assert(!got.map(_._1).contains(6L))
    // a DUPLICATED must term is one requirement, not two — the result
    // must equal the deduplicated query's, not silently empty
    val dup = Search.booleanSearchOf(docs, Seq("x", "x", "y"), Seq("bad"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dup.toSeq == got.toSeq, s"duplicate must term changed the result: ${dup.toSeq}")
  }

  test("b6 indexed form equals the ad-hoc form and pushes the term filter") {
    val direct = Search.booleanSearchOf(
      graft.Catalog.documents(spark, sfDir),
      Search.MustTerms, Search.MustNotTerms, Search.TopK).collect().toSeq
    val indexed = Search.booleanSearch(spark, sfDir)
    assert(indexed.collect().toSeq == direct,
      "the postings index is derived state — indexed boolean must equal ad-hoc")
    assert(direct.nonEmpty, "gate query selects no documents — weak fixture")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(tok"),
      s"must/must-not terms not pushed to the postings scan:\n$plan")
  }

  test("b5 proximity: window edges, order, cell boundaries, equi-join plan") {
    val docs = Seq(
      (1L, "table merge"),                    // gap 1 -> in
      (2L, "table x y z merge"),              // gap 4 = window -> in
      (3L, "table x y z w merge"),            // gap 5 -> out
      (4L, "merge table"),                    // wrong order -> out
      (5L, "table a merge b table c merge"))  // pairs: (0,2),(0,6)? gap 6 out; (4,6) -> 2
      .toDF("doc_id", "text")
    val df = Search.proximitySearchOf(docs, "table", "merge", 4)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 2L), s"got $got")
    // grid boundary: a at pos 3 (cell 0), b at pos 4 (cell 1) — only the
    // below-cell registration of b can meet a
    val edge = Search.proximitySearchOf(
      Seq((9L, "x y z table merge")).toDF("doc_id", "text"), "table", "merge", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge == Map(9L -> 1L))
    // the banding must plan an equi-join, never a nested loop
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("b9 passages: localization, passage-level length norm, packed-key round-trip") {
    // doc 1: 40 tokens, the probe term sits in the TAIL — chunk 1 only
    // (tokens 25..40); chunk 0 (1..32) never matches. doc 2: a single
    // short chunk carrying the same term once.
    // filler docs keep df << N so idf_bits stays positive (a 3-passage
    // corpus with df=2 floors the quantized idf to 0 bits)
    val c = corpus(
      (1L, ((1 to 39).map(i => s"f$i") :+ "needle").mkString(" ")),
      (2L, "pad needle end"),
      (3L, "filler one"), (4L, "filler two"), (5L, "filler three"),
      (6L, "filler four"), (7L, "filler five"))
    val rows = Search.bm25PassagesOf(c, Seq("needle"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only the matching passages return, identified at chunk granularity
    assert(rows.map(t => (t._1, t._2)).toSet == Set((1L, 1L), (2L, 0L)))
    // passage-level length normalization: doc 2's 3-token passage
    // out-scores doc 1's 16-token passage at equal tf — the whole point
    // of scoring chunks, a document-level run would weigh doc lengths
    val byDoc = rows.map(t => (t._1, t._4)).toMap
    assert(byDoc(2L) > byDoc(1L),
      s"short passage must out-score long at equal tf: $byDoc")
    // and every returned (doc, chunk) exists in x14's chunk relation
    val chunks = TextOps.ragChunksOf(c).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(t => chunks.contains((t._1, t._2))))
  }

  test("b8: the maintained index is SET-equal to a full rebuild over the revised corpus") {
    val docs = graft.Catalog.documents(spark, sfDir)
    val (merged, stats) = Search.incrementalIndex(spark, sfDir)
    // the rebuild the incremental view must match: tokenize the revised
    // corpus from scratch (what a nightly full re-index would do)
    val dl = Search.revisedCorpus(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val rebuilt = dl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), col("doc_id"), col("dl"), col("tf")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val (m, r) = (rows(merged), rows(rebuilt))
    assert(m == r, s"maintained view drifted from rebuild: " +
      s"extra=${(m -- r).take(3)} missing=${(r -- m).take(3)}")
    val sGot = stats.collect().head
    val sWant = dl.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).as("t")).collect().head
    assert(sGot.getLong(0) == sWant.getLong(0) &&
      sGot.getLong(1) == sWant.getLong(1),
      s"stats drifted: got $sGot want $sWant")
  }

  test("b8: scoring off the maintained view equals scoring a from-scratch rebuild") {
    val docs = graft.Catalog.documents(spark, sfDir)
    val direct = Search.bm25Of(Search.revisedCorpus(docs),
        Search.QueryTerms, Search.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaIndex = Search.bm25IncrementalIndex(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIndex.toSeq == direct.toSeq,
      s"maintained-view scores drifted: got ${viaIndex.toSeq} want ${direct.toSeq}")
    // and the delta genuinely reaches the view: the added docs (which
    // contain every probe term) must appear among the scored postings
    val (merged, _) = Search.incrementalIndex(spark, sfDir)
    assert(merged.filter(col("doc_id") >= Search.AddedIdOffset).limit(1)
      .collect().nonEmpty, "no added-doc postings in the maintained view")
  }

  // ---------------------------------------------------------------------
  // b13 — right-to-be-forgotten propagation
  // ---------------------------------------------------------------------

  test("b13: tombstoned postings equal a from-scratch rebuild of the kept corpus") {
    val docs = graft.Catalog.documents(spark, sfDir)
    val forgotten = docs.filter(col("source") === Search.ForgetSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(forgotten.nonEmpty, "no revoked-source docs — vacuous fixture")
    val (_, maintained, adjusted) = Search.forgetViews(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("tok", "doc_id", "dl", "tf").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = rows(maintained)
    assert(got.forall(p => !forgotten.contains(p._2)),
      "a forgotten doc survives in the maintained postings")
    // from-scratch rebuild over the kept corpus — must be SET-equal
    val kept = docs.filter(
      col("source").isNull || col("source") =!= Search.ForgetSource)
    val rebuilt = rows(Search.postingsOf(kept))
    assert(got === rebuilt, "maintained view drifted from a full rebuild")
    // adjusted stats must equal the kept corpus' recomputed stats exactly
    val adj = adjusted.collect().head
    val rec = Search.statsOfDocs(kept).collect().head
    assert((adj.getLong(0), adj.getLong(1)) === ((rec.getLong(0), rec.getLong(1))),
      "adjusted (N, T) drifted from recomputation")
  }

  test("b13: the probe's tok IN-list pushes THROUGH the tombstone anti-join") {
    // the whole point of the maintained view: the revocation adds an
    // 8-byte-key anti-join but must not cost the pushed term scan
    val plan = Search.forgetSearch(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(tok"),
      s"tok IN (…) lost below the anti-join:\n$plan")
    assert(plan.contains("LeftAnti"), "tombstone anti-join missing")
  }

  test("b13: the forget visibly shifts the probe's scores vs the full corpus") {
    val full = Search.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val after = Search.forgetSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(full !== after,
      "forgetting a whole source left the probe results bit-identical")
  }

  // ---------------------------------------------------------------------
  // b12 — pseudo-relevance-feedback expansion
  // ---------------------------------------------------------------------

  test("b12: expansion retrieves the vocabulary-mismatch doc the base query cannot") {
    // docs 1-3 match the base term and all carry the rare companion
    // "gold"; doc 4 says ONLY "gold" — invisible to the base query,
    // reachable after feedback expansion. "pad" is pooled too but
    // common (every doc), so idf_bits × ptf favors "gold".
    val docs = corpus(
      Seq((1L, "q gold pad pad"), (2L, "q gold pad pad"),
        (3L, "q gold pad pad"), (4L, "gold pad pad pad")) ++
        (5L to 16L).map(i => (i, "pad noise filler words")): _*)
    val base = Search.bm25Of(docs, Seq("q"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(!base.contains(4L), "mismatch doc visible to base query — bad fixture")
    val expanded = Search.prfExpansionOf(docs, Seq("q"), f = 3, e = 1, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(expanded.contains(4L),
      s"expansion failed to retrieve the gold-only doc: $expanded")
  }

  test("b12: feedback from the top-F docs only — junk outside F never expands") {
    // doc 4 is the ONLY base match ranked below F... simpler: the rare
    // term "junk" lives in a NON-matching doc, so it can never be
    // pooled; results must equal the base+pooled-common expansion
    val docs = corpus(
      Seq((1L, "q gold pad"), (2L, "q gold pad"), (3L, "q gold pad"),
        (4L, "junk junk junk")) ++
        (5L to 16L).map(i => (i, "pad noise filler words")): _*)
    val got = Search.prfExpansionOf(docs, Seq("q"), f = 3, e = 1, k = 16)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(4L), "a never-pooled term leaked into the expansion")
  }

  test("b12: gate (indexed two-phase) equals the direct form on the fixture") {
    val direct = Search.prfExpansionOf(
        graft.Catalog.documents(spark, sfDir), Search.QueryTerms,
        Search.PrfFeedbackDocs, Search.PrfExpandTerms, Search.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val indexed = Search.prfExpansion(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(indexed.toSeq === direct.toSeq,
      s"indexed PRF drifted: got ${indexed.toSeq} want ${direct.toSeq}")
    assert(direct.nonEmpty)
  }

  // ---------------------------------------------------------------------
  // b11 — snippet localization
  // ---------------------------------------------------------------------

  private def snips(terms: Seq[String], rows: (Long, String)*) =
    Search.snippetWindowOf(corpus(rows: _*), terms).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap

  test("b11: the minimal window is found, not just the first or last") {
    // doc 1: the tight windows are the TRAILING "b a c" (start 4) and
    // "a c b" (start 5), both len 3 — not the leading a..b span (5);
    // leftmost of the two wins. doc 2 lacks 'c' entirely.
    val got = snips(Seq("a", "b", "c"),
      (1L, "a x x x b a c b"),
      (2L, "a b a b x x x x"))
    assert(got === Map(1L -> ((3, "b a c"))))
  }

  test("b11: leftmost window wins on ties") {
    // two disjoint minimal windows "a b" at 0 and 4 — report the first
    val got = snips(Seq("a", "b"), (1L, "a b x x a b"))
    assert(got(1L) === ((2, "a b")))
  }

  test("b11: adjacent occurrence gives window_len = |terms|; case folds") {
    val got = snips(Seq("x", "y"), (1L, "pad X y pad"))
    assert(got(1L) === ((2, "x y")))
  }

  test("b11: repeated nearer occurrence tightens the running window") {
    // last 'a' before the closing 'b' is position 2, so len = 2, not 3
    val got = snips(Seq("a", "b"), (1L, "a a b"))
    assert(got(1L) === ((2, "a b")))
  }

  test("b11: fixture snippets are non-vacuous and every snippet covers all terms") {
    val got = Search.snippetWindow(spark, sfDir).collect()
    assert(got.length > 0, "no fixture doc contains all snippet terms — vacuous")
    got.foreach { r =>
      val toks = r.getString(2).split(" ")
      assert(toks.length === r.getInt(1),
        s"doc ${r.getLong(0)}: snippet length != window_len")
      Search.SnippetTerms.foreach(t =>
        assert(toks.contains(t), s"doc ${r.getLong(0)}: snippet misses '$t'"))
      // minimality at the edges: a window not STARTING and ENDING on a
      // query term could shrink — both boundary tokens must be terms
      assert(Search.SnippetTerms.contains(toks.head) &&
        Search.SnippetTerms.contains(toks.last),
        s"doc ${r.getLong(0)}: window not tight at its edges")
    }
  }

  test("b16: MRR finds the first ALL-terms doc, not the top-ranked partial match") {
    import spark.implicits._
    // probe 1 = {x, y}: x is rare (df 2) and stuffed in the short doc 10,
    // y is corpus-common (idf 0 bits), and the all-terms doc 11 is long —
    // so the PARTIAL match outranks on BM25 and the first all-terms doc
    // sits at rank 2, rr = 500000. probe 2 = {zz}: nothing → -1 / 0.
    val docs = (Seq(
      (10L, "x x x x x x x x"),
      (11L, "x y " + Seq.fill(28)("filler").mkString(" "))) ++
      (12L to 19L).map(i => i -> s"y pad$i pad$i pad$i"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "x"), (1L, "y"), (2L, "zz")).toDF("query_id", "tok")
    val nt = Seq((1L, 2L), (2L, 1L)).toDF("query_id", "n_terms")
    val ranked = Search.bm25BatchOf(docs, probes, 10)
    // precondition: the term-stuffed partial match really does outrank
    val top1 = ranked.filter(col("query_id") === 1L && col("rank") === 1L)
      .collect()(0)
    assert(top1.getLong(1) === 10L && top1.getLong(2) === 1L,
      s"fixture assumption broke: $top1")
    val got = Search.mrrEvalOf(ranked, nt).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((2L, 1L, 500000L)),
      "all-terms doc at rank 2 → rr exactly 1e6 div 2")
    assert(got(2L) === ((-1L, 0L, 0L)),
      "probe with no all-terms doc reports -1/0, not absence")
  }

  test("b16 fixture gate: reciprocal-rank arithmetic is internally consistent") {
    val got = Search.mrrEval(spark, sfDir).collect()
    assert(got.length === Search.BatchQueries.length)
    got.foreach { r =>
      val (fr, hits, rr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      if (fr > 0) {
        assert(rr === 1000000L / fr && hits >= 1L)
        assert(fr <= Search.TopK.toLong)
      } else assert(fr === -1L && hits === 0L && rr === 0L)
    }
  }
}
