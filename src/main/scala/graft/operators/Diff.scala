package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Catalog

/** Snapshot reconciliation — diff two versions of a keyed table into
  * added / removed / changed rows (training-data extension). This is the
  * primitive behind incremental pipeline runs at 100 TB: "yesterday's
  * crawl vs today's" decides what re-enters dedup/quality/packing, so
  * the whole pipeline reprocesses a delta instead of the corpus.
  *
  * Plan shape: both sides reduce to (key, fingerprint) in a map pass —
  * the 60-bit content hash, not the payload, crosses the wire — then ONE
  * full-outer equi-join on the key classifies every row; unchanged rows
  * (equal fingerprints) drop before the output. On bucketed layouts
  * (`Layout.writeBucketed` on the key) the join plans Exchange-free;
  * otherwise it is one hash-partitioned shuffle of 12-byte rows, with
  * AQE handling skew.
  */
object Diff {

  /** Classify `b` (new snapshot) against `a` (old snapshot) by `key`:
    * `added` (key only in b), `removed` (only in a), `changed` (both,
    * fingerprints differ). Equal-fingerprint rows are dropped.
    */
  def diffByKey(a: DataFrame, b: DataFrame, key: String, fp: Column): DataFrame =
    // presence markers, NOT fingerprint nullness, decide added/removed: a
    // NULL payload (e.g. a NULL-text document) fingerprints to NULL while
    // being present — and two NULL fingerprints compare as unchanged via
    // the null-safe <=>
    a.select(col(key), lit(1).as("in_a"), fp.as("fp_a"))
      .join(b.select(col(key), lit(1).as("in_b"), fp.as("fp_b")),
        Seq(key), "full_outer")
      .withColumn("status",
        when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed")
          .when(!(col("fp_a") <=> col("fp_b")), "changed"))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))

  // ---------------------------------------------------------------------
  // U1 gate entry: two deterministic snapshot views of `documents` stand
  // in for consecutive crawl days — the old snapshot is missing every
  // 7th document (not yet crawled), the new one dropped every 5th
  // (expired) and re-rendered every 11th (changed boilerplate, modelled
  // as an upper-cased body). The diff must classify exactly those.
  // ---------------------------------------------------------------------
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.documents(spark, dir)
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, upper(col("text")))
          .otherwise(col("text")))
    diffByKey(oldSnap, newSnap, "doc_id", TextOps.hash60(col("text")))
      .orderBy(col("doc_id"))
  }

  val corpusDiffSql: String = {
    val fpOld = TextOps.hash60Sql("text")
    val fpNew = TextOps.hash60Sql(
      "CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END")
    s"""WITH a AS (SELECT doc_id, $fpOld AS fp_a FROM documents WHERE doc_id % 7 <> 0),
       |b AS (SELECT doc_id, $fpNew AS fp_b FROM documents WHERE doc_id % 5 <> 0)
       |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       | CASE WHEN a.doc_id IS NULL THEN 'added'
       |      WHEN b.doc_id IS NULL THEN 'removed'
       |      WHEN fp_a IS DISTINCT FROM fp_b THEN 'changed' END AS status
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
       |WHERE (a.doc_id IS NULL OR b.doc_id IS NULL OR fp_a IS DISTINCT FROM fp_b)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // U2 — incremental curation: the reason u1 exists, composed end to end.
  // Only the diff's added/changed documents re-enter the pipeline; each
  // passes the cheap quality gate (length floor) and an exact-dedup
  // anti-join against the EXISTING corpus' prefix fingerprints (d1's
  // key) — new content identical to something already retained is not
  // re-ingested. At 100 TB this is the daily-run shape: work scales with
  // the delta, the only corpus-sized contact is the fingerprint
  // anti-join (8-byte keys, broadcastable when the delta is small —
  // which is the point).
  // ---------------------------------------------------------------------
  val MinIngestChars = 100

  /** Delta-curation core over two (doc_id, text) snapshots. */
  def incrementalCurationOf(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val delta = diffByKey(oldSnap, newSnap, "doc_id",
      TextOps.hash60(col("text")))
      .filter(col("status") =!= "removed")
    val existingFps = oldSnap
      .select(Dedup.prefixFingerprint(col("text")).as("fp")).distinct()
    newSnap.join(delta, "doc_id")
      .filter(length(col("text")) >= MinIngestChars)
      .withColumn("fp", Dedup.prefixFingerprint(col("text")))
      .join(existingFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("status"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  def incrementalCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.documents(spark, dir)
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("text"))
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, upper(col("text")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("text"))
    incrementalCurationOf(oldSnap, newSnap)
  }

  val incrementalCurationSql: String = {
    // generate the fingerprint expression per qualified column — string
    // surgery over hash60Sql's output would silently corrupt the oracle
    // if the generated SQL ever contained another 'text' substring
    val fpA = TextOps.hash60Sql("a.text")
    val fpB = TextOps.hash60Sql("b.text")
    val newText = "CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END"
    s"""WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
       |b AS (SELECT doc_id, $newText AS text FROM documents WHERE doc_id % 5 <> 0),
       |delta AS (
       | SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |  CASE WHEN a.doc_id IS NULL THEN 'added'
       |       WHEN $fpA IS DISTINCT FROM $fpB THEN 'changed' END AS status
       | FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
       | WHERE b.doc_id IS NOT NULL
       |  AND (a.doc_id IS NULL
       |   OR $fpA IS DISTINCT FROM $fpB)),
       |fps AS (SELECT DISTINCT ${Dedup.prefixFingerprintSql("text")} AS fp
       | FROM a WHERE text IS NOT NULL)
       |SELECT b.doc_id, status, CAST(length(b.text) AS BIGINT) AS n_chars
       |FROM b JOIN delta USING (doc_id)
       |WHERE length(b.text) >= $MinIngestChars
       | AND ${Dedup.prefixFingerprintSql("b.text")} NOT IN (SELECT fp FROM fps)
       |ORDER BY b.doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // U3 — diff between TABLE VERSIONS: u1's primitive composed over s24's
  // time-travel reads — "what changed between v1 and v2" as two
  // manifest-pruned scans and one 12-byte-row fingerprint join, no
  // restored backups, no retained copies outside the table's own
  // history. The gate commits the fixture corpus as v1, b8's revision +
  // addition delta as v2 (one shared delta definition, so the three
  // incremental stories — index maintenance, snapshot history, diff —
  // provably describe the SAME change), then accounts the diff by
  // status. A NULL-text doc revised to NULL is UNCHANGED (concat
  // propagates NULL; NULL fingerprints compare null-safely equal) —
  // the diff reports content change, not delta membership.
  // ---------------------------------------------------------------------
  def versionDiff(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import graft.lifecycle.Versioned
    val t = graft.Scratch.freshRunDir(spark, "versioned_diff_run", dir) +
      "/docs_v"
    val docs = graft.Catalog.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    Versioned.append(t, docs)
    Versioned.rewrite(t)(_ => Search.revisedCorpus(docs))
    diffByKey(Versioned.readVersion(t, 1), Versioned.readVersion(t, 2),
        "doc_id", TextOps.hash60(col("text")))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  // the n > 0 filter mirrors groupBy-on-status semantics: a status with
  // no rows does not appear (an empty corpus diffs to an EMPTY relation,
  // not two zero rows)
  val versionDiffSql: String =
    """WITH c AS (
      | SELECT 'added' AS status, count(*)::BIGINT AS n
      | FROM documents WHERE doc_id % 50 = 3
      | UNION ALL
      | SELECT 'changed', count(*)::BIGINT
      | FROM documents WHERE doc_id % 10 = 7 AND text IS NOT NULL)
      |SELECT status, n FROM c WHERE n > 0 ORDER BY status"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // U4 — THREE-WAY merge: two curation lines diverge from a common base
  // (two teams scrub the same crawl; a backfill lands while a cleanup
  // runs) and must reconcile — the git merge problem on keyed corpora,
  // decided entirely on content fingerprints. Per key, against base
  // fingerprint fb and branch fingerprints fo/ft (null-safe compares —
  // NULL payloads are content like any other, the u1/u3 rule):
  //   present everywhere:  fo=fb & ft=fb → unchanged; only one side
  //     moved → take the mover; both moved identically → both_same;
  //     both moved apart → conflict_edit
  //   deleted in one side: other unchanged → deleted (delete wins);
  //     other modified → conflict_delete (the delete/modify case);
  //     deleted in both → deleted
  //   absent from base:    added one side → take it; added both,
  //     same content → both_same; different → conflict_add
  // Conflicts are REPORTED, never auto-resolved — exactly what git does,
  // and the only safe default for data whose payload the engine cannot
  // judge.
  //
  // Plan/scale: three map-side (key, side-tag, fingerprint) projections
  // — 13-byte rows cross the wire, never payloads — unioned and
  // collapsed by ONE hash aggregate on the 8-byte key (side-conditional
  // max pivots the three fingerprints wide, map-side partials apply).
  // One shuffle total: the two-full-outer-join formulation was measured
  // to re-shuffle its own intermediate, because a full-outer USING join
  // COALESCES the key — the output partitioning is on a new expression,
  // so the second join cannot reuse it. The registered output is the
  // resolution accounting; the per-key decision relation (what a merge
  // tool consumes) is the same DAG minus the final tiny aggregate.
  // Assumes keys are unique within each snapshot (the u1/u3 contract).
  // ---------------------------------------------------------------------

  /** Per-key three-way merge decisions over (key, fingerprint) triples. */
  def mergeByKey(base: DataFrame, ours: DataFrame, theirs: DataFrame,
      key: String, fp: Column): DataFrame = {
    def sideOf(df: DataFrame, tag: String) =
      df.select(col(key), lit(tag).as("side"), fp.as("fp"))
    sideOf(base, "b")
      .unionByName(sideOf(ours, "o"))
      .unionByName(sideOf(theirs, "t"))
      .groupBy(col(key))
      .agg(
        max(when(col("side") === "b", lit(1))).as("in_b"),
        max(when(col("side") === "o", lit(1))).as("in_o"),
        max(when(col("side") === "t", lit(1))).as("in_t"),
        max(when(col("side") === "b", col("fp"))).as("fp_b"),
        max(when(col("side") === "o", col("fp"))).as("fp_o"),
        max(when(col("side") === "t", col("fp"))).as("fp_t"))
      .withColumn("resolution",
        when(col("in_b").isNotNull && col("in_o").isNotNull &&
            col("in_t").isNotNull,
          when((col("fp_o") <=> col("fp_b")) && (col("fp_t") <=> col("fp_b")),
            "unchanged")
            .when(col("fp_o") <=> col("fp_b"), "take_theirs")
            .when(col("fp_t") <=> col("fp_b"), "take_ours")
            .when(col("fp_o") <=> col("fp_t"), "both_same")
            .otherwise("conflict_edit"))
          .when(col("in_b").isNotNull && col("in_o").isNull &&
            col("in_t").isNull, "deleted")
          .when(col("in_b").isNotNull && col("in_o").isNull,
            when(col("fp_t") <=> col("fp_b"), "deleted")
              .otherwise("conflict_delete"))
          .when(col("in_b").isNotNull,
            when(col("fp_o") <=> col("fp_b"), "deleted")
              .otherwise("conflict_delete"))
          .when(col("in_t").isNull, "take_ours")
          .when(col("in_o").isNull, "take_theirs")
          .otherwise(when(col("fp_o") <=> col("fp_t"), "both_same")
            .otherwise("conflict_add")))
      .select(col(key), col("resolution"))
  }

  /** Gate branches: deterministic divergent curation lines off the
    * documents fixture. Ours re-renders every 7th doc (upper) and drops
    * every 11th, theirs tags every 5th and drops every 13th; BOTH apply
    * the same policy re-render to every 23rd (the identical-edit case);
    * both backfill new keys (doc_id+1e6) from disjoint-but-overlapping
    * slices (%17 vs %19, with different content) so clean adds AND an
    * add/add conflict occur. Every resolution class is populated.
    */
  private def mergeBranches(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val base = docs.select(col("doc_id"), col("text"))
    val ours = base.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 23 === 0, upper(col("text")))
          .when(col("doc_id") % 7 === 0, upper(col("text")))
          .otherwise(col("text")))
      .unionByName(base.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val theirs = base.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 23 === 0, upper(col("text")))
          .when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [t]")))
          .otherwise(col("text")))
      .unionByName(base.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          upper(col("text")).as("text")))
    (base, ours, theirs)
  }

  def threeWayMerge(spark: SparkSession, dir: String): DataFrame = {
    val (base, ours, theirs) =
      mergeBranches(Catalog.documents(spark, dir))
    mergeByKey(base, ours, theirs, "doc_id", TextOps.hash60(col("text")))
      .groupBy(col("resolution")).agg(count(lit(1)).as("n"))
      .orderBy(col("resolution"))
  }

  val threeWayMergeSql: String = {
    val fpB = TextOps.hash60Sql("b.text")
    val fpO = TextOps.hash60Sql("o.text")
    val fpT = TextOps.hash60Sql("t.text")
    val oursText =
      "CASE WHEN doc_id % 23 = 0 THEN upper(text) " +
        "WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END"
    val theirsText =
      "CASE WHEN doc_id % 23 = 0 THEN upper(text) " +
        "WHEN doc_id % 5 = 0 THEN text || ' [t]' ELSE text END"
    s"""WITH b AS (SELECT doc_id, text FROM documents),
       |o AS (
       | SELECT doc_id, $oursText AS text FROM documents WHERE doc_id % 11 <> 0
       | UNION ALL
       | SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 0),
       |t AS (
       | SELECT doc_id, $theirsText AS text FROM documents WHERE doc_id % 13 <> 0
       | UNION ALL
       | SELECT doc_id + 1000000, upper(text) FROM documents WHERE doc_id % 19 = 0),
       |m AS (
       | SELECT COALESCE(b.doc_id, o.doc_id, t.doc_id) AS doc_id,
       |  b.doc_id IS NOT NULL AS in_b, o.doc_id IS NOT NULL AS in_o,
       |  t.doc_id IS NOT NULL AS in_t,
       |  $fpB AS fp_b, $fpO AS fp_o, $fpT AS fp_t
       | FROM b FULL OUTER JOIN o ON b.doc_id = o.doc_id
       |  FULL OUTER JOIN t ON COALESCE(b.doc_id, o.doc_id) = t.doc_id),
       |r AS (
       | SELECT CASE
       |  WHEN in_b AND in_o AND in_t THEN CASE
       |   WHEN fp_o IS NOT DISTINCT FROM fp_b
       |    AND fp_t IS NOT DISTINCT FROM fp_b THEN 'unchanged'
       |   WHEN fp_o IS NOT DISTINCT FROM fp_b THEN 'take_theirs'
       |   WHEN fp_t IS NOT DISTINCT FROM fp_b THEN 'take_ours'
       |   WHEN fp_o IS NOT DISTINCT FROM fp_t THEN 'both_same'
       |   ELSE 'conflict_edit' END
       |  WHEN in_b AND NOT in_o AND NOT in_t THEN 'deleted'
       |  WHEN in_b AND NOT in_o THEN
       |   CASE WHEN fp_t IS NOT DISTINCT FROM fp_b THEN 'deleted'
       |        ELSE 'conflict_delete' END
       |  WHEN in_b THEN
       |   CASE WHEN fp_o IS NOT DISTINCT FROM fp_b THEN 'deleted'
       |        ELSE 'conflict_delete' END
       |  WHEN NOT in_t THEN 'take_ours'
       |  WHEN NOT in_o THEN 'take_theirs'
       |  ELSE CASE WHEN fp_o IS NOT DISTINCT FROM fp_t THEN 'both_same'
       |            ELSE 'conflict_add' END END AS resolution
       | FROM m)
       |SELECT resolution, count(*)::BIGINT AS n FROM r
       |GROUP BY resolution ORDER BY resolution""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // U5 — corpus PROVENANCE ("git blame" for documents): for every key
  // across a versioned table's whole history, the version that INTRODUCED
  // it, the version of its LAST content change, and how many revisions it
  // has seen. The lineage questions every dataset audit asks — "when did
  // this document enter the corpus, has it been edited since, how churned
  // is this slice" — answered from s24's committed snapshots alone, no
  // side metadata. u1/u3 diff ADJACENT versions; u5 folds the whole
  // timeline per key.
  //
  // Plan/scale: each version contributes a map-side (key, v, fingerprint)
  // projection — 13-byte rows, payloads never move (the u4 discipline) —
  // unioned through ONE key-partitioned shuffle; the per-key timeline is
  // ≤ V rows, so the lag window runs over tiny groups at full key
  // parallelism (never a one-partition window). V manifest-pruned scans
  // are the irreducible cost of reading V versions; at 100 TB a
  // deployment provenance-folds incrementally (fold v(N+1) into the
  // persisted provenance relation — one delta scan) exactly like b8's
  // index maintenance.
  //
  // Change rule: a row CHANGES at version v when its fingerprint differs
  // null-safely from its previous appearance (NULL payloads are content —
  // the u1/u3/u4 rule); introduction itself is not a change, so an
  // added-then-untouched doc has 0 revisions. Deletions are visible as
  // absence from later versions (n_versions < latest − introduced_in + 1)
  // — reported, not folded into last_changed, which tracks CONTENT edits.
  // ---------------------------------------------------------------------

  /** Provenance fold over explicit (version, snapshot) pairs; snapshots
    * carry (key, payload); fingerprints compare null-safely.
    */
  def provenanceOf(versions: Seq[(Int, DataFrame)], key: String,
      fp: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("v"))
    val tagged = versions.map { case (v, df) =>
      df.select(col(key), lit(v).as("v"), fp.as("fp"))
    }.reduce(_ unionByName _)
    tagged
      .withColumn("prev_fp", lag(col("fp"), 1).over(w))
      .withColumn("is_first", lag(col("v"), 1).over(w).isNull)
      .withColumn("changed",
        !col("is_first") && !(col("fp") <=> col("prev_fp")))
      .groupBy(col(key))
      .agg(
        min(col("v")).as("introduced_in"),
        coalesce(max(when(col("changed"), col("v"))), min(col("v")))
          .as("last_changed"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("n_revisions"),
        count(lit(1)).as("n_versions"))
  }

  /** Gate entry: the u3 timeline (v1 = base docs, v2 = the deterministic
    * revised corpus) folded to per-document provenance.
    */
  def provenance(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import graft.lifecycle.Versioned
    val t = graft.Scratch.freshRunDir(spark, "versioned_prov_run", dir) +
      "/docs_v"
    val docs = graft.Catalog.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    Versioned.append(t, docs)
    Versioned.rewrite(t)(_ => Search.revisedCorpus(docs))
    provenanceOf(
      Seq(1 -> Versioned.readVersion(t, 1), 2 -> Versioned.readVersion(t, 2)),
      "doc_id", TextOps.hash60(col("text")))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the same provenance derived from the deterministic revision
    * rules (u3's precedent) — base docs introduced at 1 (revised ones
    * doc_id % 10 = 7 with non-NULL text change at 2), added docs
    * (doc_id % 50 = 3, id-shifted) introduced at 2 with no revision.
    */
  val provenanceSql: String =
    s"""SELECT doc_id,
       | CAST(1 AS INT) AS introduced_in,
       | CAST(CASE WHEN doc_id % 10 = 7 AND text IS NOT NULL
       |  THEN 2 ELSE 1 END AS INT) AS last_changed,
       | CAST(CASE WHEN doc_id % 10 = 7 AND text IS NOT NULL
       |  THEN 1 ELSE 0 END AS BIGINT) AS n_revisions,
       | CAST(2 AS BIGINT) AS n_versions
       |FROM documents
       |UNION ALL
       |SELECT doc_id + ${Search.AddedIdOffset}, 2, 2, 0, 1
       |FROM documents WHERE doc_id % 50 = 3
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  val all: Seq[Q] = Seq(
    Q("u5_provenance", provenance, Some(provenanceSql),
      "corpus provenance (git blame for documents): per key across the " +
        "whole versioned history the introducing version, the last " +
        "content change, revision count, and presence count — map-side " +
        "(key, v, fingerprint) projections through one key-partitioned " +
        "shuffle, per-key timelines of <= V rows under the lag window " +
        "(training-data extension)"),
    Q("u4_three_way_merge", threeWayMerge, Some(threeWayMergeSql),
      "three-way merge of two curation branches off a common base — the git merge decision on content fingerprints: movers win, identical edits collapse, divergent edits / delete-vs-modify / add-add collisions surface as conflicts, never auto-resolved; 12-byte rows through two key equi-joins (training-data extension)"),
    Q("u3_version_diff", versionDiff, Some(versionDiffSql),
      "u1's diff composed over s24's time-travel reads: what changed between two committed table versions, from two manifest-pruned scans + one fingerprint join — accounted against b8's shared delta definition, so index maintenance, snapshot history, and diff provably describe the same change (training-data extension)"),
    Q("u1_corpus_diff", corpusDiff, Some(corpusDiffSql),
      "snapshot diff: added/removed/changed via one full-outer join over map-side (key, content-fingerprint) pairs — the incremental-run primitive (training-data extension)"),
    Q("u2_incremental_curation", incrementalCuration, Some(incrementalCurationSql),
      "diff-driven delta curation: only added/changed docs re-enter the pipeline, pass the quality floor, and anti-join the existing corpus' exact-dedup fingerprints — daily-run work scales with the delta (training-data extension)"))
}
