package graft.operators

import java.nio.file.Files

import graft.SparkSuite

/** NULL-text semantics, pinned (r7 verdict item 4): the lang-ID kernel is
  * a null-intolerant expression (NULL text → NULL), but every oracle
  * renders detection as `CASE WHEN best > 0 THEN … ELSE 'und' END`, which
  * maps NULL to 'und'. The fixtures carry no NULL texts, so the engines
  * agreed by accident; [[TextOps.detectedLang]] now coalesces NULL → 'und'
  * so a NULL-text row groups identically on both engines. This spec is the
  * NULL-row fixture the fixtures lack, exercised through x1/x3/x6/z1; each
  * expected value below is the DuckDB oracle's result computed by its
  * documented NULL rules (len/length/sum-skip/CASE), so a regression on
  * either convention breaks the spec.
  */
class NullTextSpec extends SparkSuite {

  // ≥ 20 whitespace tokens (clears z1's quality band) and rich in English
  // markers so detection is unambiguous
  private val EnText =
    "the cat and the dog is a friend of the house and the garden is " +
      "a place of the sun and the rain"

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-nulltext").toString
    import spark.implicits._
    Seq(
      (1L, Option(EnText), "en", "web", EnText.length.toLong),
      (2L, Option(EnText), "en", "web", EnText.length.toLong), // exact dup of 1
      (3L, Option.empty[String], "en", "web", 0L), // THE NULL-text row
      (4L, Option("der die das und ist nicht der die das"), "de", "web", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("x3: NULL text detects as 'und', matching the oracle's CASE") {
    val byId = TextOps.langId(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(3L) == "und",
      "NULL text must land in 'und' (the oracle's CASE does; a NULL group would diverge)")
    assert(byId(1L) == "en" && byId(2L) == "en" && byId(4L) == "de")
  }

  test("x1: NULL text yields NULL measures, matching len/length(NULL)") {
    val row = TextOps.tokenCounts(spark, corpus).collect()
      .find(_.getLong(0) == 3L).get
    // DuckDB: length(NULL), len(string_split_regex(NULL, …)),
    // len(regexp_extract_all(NULL, …)) are all NULL; Spark's size(NULL)
    // is NULL too (non-legacy default) — both engines agree on NULL
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3),
      s"NULL text must yield NULL token/char measures, got $row")
  }

  test("x6: the NULL-text doc lands in the 'und' group; sums skip its NULLs") {
    val groups = TextOps.corpusAccounting(spark, corpus).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(groups.keySet == Set("de", "en", "und"))
    val en = groups("en")
    assert(en.getLong(1) == 2L &&
      en.getLong(2) == EnText.split(" ").length.toLong * 2 &&
      en.getLong(3) == EnText.length.toLong * 2)
    // the 'und' group holds exactly the NULL doc: counted in n_docs
    // (count(*)), but its NULL token/char measures are skipped by sum()
    // on BOTH engines — an empty sum is NULL, not 0
    val und = groups("und")
    assert(und.getLong(1) == 1L, "NULL-text doc must be counted in n_docs")
    assert(und.isNullAt(2) && und.isNullAt(3),
      "sums over only-NULL measures must be NULL (both engines skip NULLs)")
  }

  test("z1: the pipeline drops the NULL-text doc and still dedups the rest") {
    val kept = Pipeline.corpusPipeline(spark, corpus).collect().map(_.getLong(0))
    // doc 2 is an exact dup (keeper 1), doc 3 is NULL text ('und' ≠ 'en',
    // and its quality measures are NULL → fails the token band on both
    // engines), doc 4 is German — only doc 1 survives
    assert(kept.toSeq == Seq(1L),
      s"expected only doc 1 to survive, got ${kept.toSeq}")
  }
}
