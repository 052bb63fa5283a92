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

  val all: Seq[Q] = Seq(
    Q("u3_version_diff", versionDiff, Some(versionDiffSql),
      "u1's diff composed over s24's time-travel reads: what changed between two committed table versions, from two manifest-pruned scans + one fingerprint join — accounted against b8's shared delta definition, so index maintenance, snapshot history, and diff provably describe the same change (training-data extension)"),
    Q("u1_corpus_diff", corpusDiff, Some(corpusDiffSql),
      "snapshot diff: added/removed/changed via one full-outer join over map-side (key, content-fingerprint) pairs — the incremental-run primitive (training-data extension)"),
    Q("u2_incremental_curation", incrementalCuration, Some(incrementalCurationSql),
      "diff-driven delta curation: only added/changed docs re-enter the pipeline, pass the quality floor, and anti-join the existing corpus' exact-dedup fingerprints — daily-run work scales with the delta (training-data extension)"))
}
