package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Catalog

/** Text-analysis operators for large-scale training-data pipelines
  * (builder prompt north-star; not present in the reference, which has no
  * text processing — these extend the engine over the `documents` fixture).
  *
  * All functions are pure column expressions (whole-stage codegen'd, no
  * UDFs) so they stream through a 100 TB corpus with zero shuffle — the
  * only shuffles below are the final ORDER BYs for oracle determinism.
  */
object TextOps {

  /** Lower-cased whitespace tokens — the shared tokenization all text and
    * dedup operators agree on (DuckDB mirror: string_split_regex(lower(text),'\s+')).
    * The split class is RE2's \s ([ \t\n\f\r]) spelled out, because Spark
    * regexes are Java and Java's \s also matches \x0B — the oracle's RE2
    * does not.
    */
  def tokens(text: Column): Column = split(lower(trim(text)), "[ \\t\\n\\f\\r]+")

  /** Word k-shingles as strings ("w1 w2 w3") — the unit of near-dup
    * detection. Empty when the document has fewer than k tokens.
    */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(typedLit(Seq.empty[String]))

  /** 60-bit content hash shared bit-for-bit with the DuckDB oracle:
    * first 15 hex chars of md5 → BIGINT. 60 bits keeps every value positive
    * in both engines' signed 64-bit space.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[hash60]]. */
  def hash60Sql(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  // ---------------------------------------------------------------------
  // X1 — token counting: whitespace tokens + a BPE-ish subword regex count
  // (letters runs / digit runs / single punctuation, the pre-tokenizer
  // shape of GPT-style BPE vocabularies).
  // ---------------------------------------------------------------------
  // RE2-\s-aligned (no \x0B in the whitespace class — see tokens())
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]"

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_measured"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  val tokenCountsSql: String =
    s"""SELECT doc_id, length(text) AS n_chars_measured,
       | len(string_split_regex(lower(trim(text)), '\\s+')) AS n_ws_tokens,
       | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X2 — quality scoring: length, punctuation density, stopword ratio,
  // mean word length — the standard cheap pre-filter for web corpora
  // (C4/Gopher-style rules). Flags are config, mirroring how the
  // reference treats alert thresholds as config (SURVEY.md §6).
  // ---------------------------------------------------------------------
  private[graft] val Stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    // one codegen'd kernel pass per row ([[graft.expressions.QualityStatsExpr]]);
    // the previous expression tree re-split the text four times per row and
    // ran an interpreted higher-order `filter` per token — the wrong plan
    // shape at corpus scale. Ratios derive from the counters in the outer
    // projection with the identical double-division + round arithmetic, so
    // the DuckDB oracle comparison is unchanged. CollapseProject keeps the
    // non-cheap kernel out of the final projection (evaluated once).
    val stats = graft.expressions.HashFunctions.quality_stats(
      col("text"), Stopwords)
    val nTok = col("s.n_tokens")
    val nChars = col("s.n_chars")
    Catalog.documents(spark, dir)
      .select(col("doc_id"), stats.as("s"))
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(col("s.stop_hits").cast("double") / nTok.cast("double"), 6).as("stopword_ratio"),
        round(col("s.punct_chars").cast("double") / nChars.cast("double"), 6).as("punct_ratio"),
        round(nChars.cast("double") / nTok.cast("double"), 6).as("mean_token_len"),
        (nTok >= 20 && nTok <= 100000).as("len_ok"))
      .orderBy(col("doc_id"))
  }

  val qualityScoresSql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       | len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
       | round(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t IN ($stopList)))::DOUBLE
       |   / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS stopword_ratio,
       | round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
       |   / length(text), 6) AS punct_ratio,
       | round(length(text)::DOUBLE / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS mean_token_len,
       | len(string_split_regex(lower(trim(text)), '\\s+')) BETWEEN 20 AND 100000 AS len_ok
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // X3 — language identification: marker-stopword scoring, the classic
  // n-gram-free heuristic (argmax of per-language marker hits; ties break
  // to the alphabetically-first language, 'und' when nothing matches).
  // Declared as one deterministic expression tree in both engines.
  // ---------------------------------------------------------------------
  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "y", "es", "que"),
    "fr" -> Seq("le", "la", "de", "et", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  def langId(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        detectedLang(col("text")).as("detected_lang"))
      .orderBy(col("doc_id"))

  /** The DuckDB rendering of the marker-scoring argmax as a (winner-CASE,
    * max-score) pair — shared by the x3 oracle and every downstream oracle
    * that filters on detected language (z1), so the strict-> tie-break can
    * never silently diverge between them.
    */
  private[graft] def langCaseSql: (String, String) = {
    val scoreExprs = LangMarkers.map { case (lang, markers) =>
      val lst = markers.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t IN ($lst)))"
    }
    // same fold shape as the Spark side: strict > keeps earlier lang on ties
    scoreExprs.tail.foldLeft(
      (s"'${scoreExprs.head._1}'", scoreExprs.head._2)) {
      case ((accLang, accScore), (lang, score)) =>
        (s"CASE WHEN $score > $accScore THEN '$lang' ELSE $accLang END",
          s"greatest($score, $accScore)")
    }
  }

  /** `detected_lang` as one DuckDB expression over a `text` column. */
  private[graft] def detectedLangSql: String = {
    val (winner, best) = langCaseSql
    s"CASE WHEN $best > 0 THEN $winner ELSE 'und' END"
  }

  /** The Spark-side detected-language expression, NULL-pinned: the kernel
    * ([[graft.expressions.LangIdExpr]]) is a null-intolerant unary
    * expression (NULL text → NULL), but every oracle renders detection as
    * `CASE WHEN best > 0 THEN winner ELSE 'und' END`, which maps NULL text
    * to 'und' (NULL > 0 is not true). Today's fixtures carry no NULL
    * texts, so the engines agreed by luck; the coalesce pins the semantics
    * so a future fixture with a NULL-text row cannot diverge them (one
    * NULL group vs a fattened 'und' group). ALL detected-language call
    * sites (x3, x6, z1) must ride this helper, never the raw kernel.
    */
  def detectedLang(text: Column): Column =
    coalesce(
      graft.expressions.HashFunctions.lang_id(text,
        LangMarkers.map(_._1), LangMarkers.map(_._2)),
      lit("und"))

  val langIdSql: String =
    s"""SELECT doc_id, lang AS labeled_lang,
       | $detectedLangSql AS detected_lang
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X4 — document fingerprinting: full-content hash + prefix hash (the
  // cheap URL/boilerplate-dedup key). hash60 keeps fingerprints joinable
  // as BIGINT at 100 TB (no string shuffles).
  // ---------------------------------------------------------------------
  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "[ \\t\\n\\f\\r]+", " ")

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(
        col("doc_id"),
        hash60(norm(col("text"))).as("content_fp"),
        hash60(substring(norm(col("text")), 1, 50)).as("prefix50_fp"))
      .orderBy(col("doc_id"))

  val fingerprintsSql: String = {
    val n = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    s"""SELECT doc_id,
       | ${hash60Sql(n)} AS content_fp,
       | ${hash60Sql(s"substr($n, 1, 50)")} AS prefix50_fp
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // X5 — deterministic train/val/test split assignment: bucket =
  // hash60(doc_id) mod 100, split by fixed bucket ranges (80/10/10).
  // Hash-based splitting is THE reproducible way to partition a training
  // corpus — stable under re-runs, re-shards, and corpus growth (a
  // document's split never changes), zero coordination at 100 TB (pure
  // map work; the only shuffle is the presentation sort). The shared
  // hash60 keeps the assignment recomputable anywhere, including in the
  // DuckDB oracle.
  // ---------------------------------------------------------------------
  val SplitTrainPct = 80
  val SplitValPct = 10 // test = the remainder

  /** The ONE deterministic corpus-shard expression (x5's split bucket;
    * z4 packs within it): hash60 of the id, mod the bucket count —
    * shared as a (Column, SQL) pair so the split and the packing can
    * never silently diverge on the shard formula.
    *
    * The bucket count is a DEPLOYMENT knob, not an algorithm constant:
    * z4's per-bucket cumulative sum is one task's sort+scan, so pick
    * buckets ≫ total cores AND bucket token mass ≲ a task budget
    * (roughly corpus_size / buckets ≤ a few GB) — at 100 TB that means
    * tens of thousands of buckets, not [[ShardBuckets]]'s 100. The
    * registered x5/z4 gate queries pin the default (their oracle SQL is
    * static text); scale deployments call the parameterized forms
    * ([[splitAssignAt]], [[Pipeline.sequencePackAt]]) — split fractions
    * and pack windows stay consistent at ANY count because every
    * consumer rides this one expression (PipelineSpec proves x5/z4
    * agreement at a non-default count).
    */
  val ShardBuckets = 100

  /** Token mass one pack task should own (~32M tokens ≈ 150-200 MB of
    * text): well inside an executor task's memory/time budget, large
    * enough that task overhead stays amortized.
    */
  val PackTaskTokenBudget: Long = 32L * 1000 * 1000

  /** The documented sizing formula as code — derive a scale-safe bucket
    * count from the corpus' total tokens instead of trusting a constant:
    * buckets ≥ ceil(total / [[PackTaskTokenBudget]]) (per-task mass
    * bounded), ≥ 4× the cluster parallelism (every core busy, stragglers
    * amortized), never below [[ShardBuckets]] (the gate default). At 100
    * TB (~2×10¹³ tokens) this lands in the hundreds of thousands —
    * "tens of thousands of buckets, not 100" made executable. Capped at
    * 2²⁰: beyond that, per-bucket overhead dominates and the budget
    * should rise instead.
    */
  def shardBucketsFor(totalTokens: Long, parallelism: Int): Int = {
    val byBudget =
      math.ceil(math.max(totalTokens, 0L).toDouble / PackTaskTokenBudget).toLong
    val byCores = 4L * math.max(parallelism, 1)
    math.min(math.max(ShardBuckets.toLong, math.max(byBudget, byCores)),
      1L << 20).toInt
  }

  def shardBucket(id: Column, buckets: Int = ShardBuckets): Column =
    pmod(hash60(id.cast("string")), lit(buckets)).cast("int")
  def shardBucketSql(idExpr: String, buckets: Int = ShardBuckets): String =
    s"(${hash60Sql(s"$idExpr::VARCHAR")} % $buckets)"

  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    splitAssignAt(ShardBuckets)(spark, dir)

  /** THE split rule as one expression over a shard-bucket column —
    * thresholds scale with the bucket count (bucket < buckets·80% →
    * train …), so the 80/10/10 fractions hold at any count. Every split
    * consumer (x5, z6's assembly stage) rides this one CASE; a rule that
    * lived in two places would let them diverge the day the thresholds
    * change.
    */
  def splitCase(bucket: Column, buckets: Int = ShardBuckets): Column =
    when(bucket < buckets * SplitTrainPct / 100, "train")
      .when(bucket < buckets * (SplitTrainPct + SplitValPct) / 100, "val")
      .otherwise("test")

  /** x5 at an explicit bucket count — a document's BUCKET (hence its z4
    * pack shard) stays aligned with its split by construction.
    */
  def splitAssignAt(buckets: Int)(spark: SparkSession, dir: String): DataFrame = {
    val bucket = shardBucket(col("doc_id"), buckets)
    Catalog.documents(spark, dir)
      .select(col("doc_id"), bucket.as("bucket"),
        splitCase(bucket, buckets).as("split"))
      .orderBy(col("doc_id"))
  }

  val splitAssignSql: String = {
    val b = shardBucketSql("doc_id")
    s"""SELECT doc_id, $b::INT AS bucket,
       | CASE WHEN $b < $SplitTrainPct THEN 'train'
       |      WHEN $b < ${SplitTrainPct + SplitValPct} THEN 'val'
       |      ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // X6 — corpus accounting: documents / whitespace tokens / total chars
  // per DETECTED language — the "what do we actually have" rollup every
  // training-data run starts from. Algebraic aggregate over the x3 lang
  // kernel: map-side partials, one shuffle keyed by language (dozens of
  // groups, corpus-size-independent state).
  // ---------------------------------------------------------------------
  def corpusAccounting(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(
        detectedLang(col("text")).as("detected_lang"),
        size(tokens(col("text"))).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("detected_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
      .orderBy(col("detected_lang"))

  // integer sum()s MUST be cast: DuckDB widens them to HUGEINT, Spark
  // returns BIGINT, and the driver's hash is type-sensitive (the r7 gate
  // failure) — see the oracle-authoring rule at [[graft.operators.Q]]
  val corpusAccountingSql: String =
    s"""SELECT $detectedLangSql AS detected_lang, count(*) AS n_docs,
       | CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens,
       | CAST(sum(length(text)) AS BIGINT) AS n_chars
       |FROM documents GROUP BY 1 ORDER BY detected_lang"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X8 — intra-document repetition signals (the Gopher repetition rules,
  // the quality axis x2's counters don't cover: a document can have
  // perfect length/punctuation stats and still be one bigram stuttered
  // 500 times). One codegen'd kernel pass per row
  // ([[graft.expressions.RepetitionStatsExpr]]) — per-document hash-map
  // state bounded by the document's own token count, zero shuffle; the
  // explode + per-doc groupBy alternative would shuffle every bigram of
  // the corpus. Ratios derive in the outer projection; divide-by-zero
  // (no bigrams) is an explicit NULL on both engines.
  // ---------------------------------------------------------------------
  def repetitionScores(spark: SparkSession, dir: String): DataFrame = {
    val stats = graft.expressions.HashFunctions.repetition_stats(col("text"))
    Catalog.documents(spark, dir)
      .select(col("doc_id"), stats.as("s"))
      .select(
        col("doc_id"),
        col("s.n_tokens").as("n_tokens"),
        round(lit(1.0) - col("s.n_distinct_tokens").cast("double") /
          col("s.n_tokens").cast("double"), 6).as("dup_token_ratio"),
        col("s.n_distinct_bigrams").as("n_distinct_bigrams"),
        when(col("s.n_bigrams") =!= 0,
          round(col("s.top_bigram_hits").cast("double") /
            col("s.n_bigrams").cast("double"), 6)).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  val repetitionScoresSql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
       |b AS (SELECT doc_id, w, [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg FROM t)
       |SELECT doc_id,
       | len(w)::INT AS n_tokens,
       | round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6) AS dup_token_ratio,
       | len(list_distinct(bg))::INT AS n_distinct_bigrams,
       | CASE WHEN len(bg) = 0 THEN NULL
       |  ELSE round(list_max(list_transform(list_distinct(bg),
       |    x -> len(list_filter(bg, y -> y = x))))::DOUBLE / len(bg), 6)
       | END AS top_bigram_frac
       |FROM b ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X9 — vocabulary construction: the corpus-wide token frequency table a
  // tokenizer build (BPE/WordPiece base vocabulary, frequency cutoffs)
  // starts from. Classic word count with an explicit TWO-LEVEL aggregate:
  // a first partial aggregate on (token, doc_id) makes BOTH outputs
  // algebraic — total occurrences is a sum of per-doc counts and document
  // frequency is a plain count of the first level's rows — so no
  // distinct-expansion shuffle ever carries the corpus. Truncation to the
  // top N happens BEFORE ranking: orderBy+limit plans
  // TakeOrderedAndProject (k rows per partition to the driver, no global
  // sort), and the rank window then runs over those N rows only — the h1
  // pattern (windows over aggregated dimension-sized relations, never
  // the base table). The (count desc, token) order is total, so the
  // cutoff and ranks are deterministic on both engines.
  // ---------------------------------------------------------------------
  val VocabTopN = 30

  /** Two-level vocabulary core over any (doc_id, text) frame (specs
    * inject hand-built ones).
    */
  def vocabularyOf(docs: DataFrame, topN: Int = VocabTopN): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    perDoc
      .groupBy(col("tok"))
      .agg(sum(col("tf")).as("n_occurrences"), count(lit(1)).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("tok"))))
      .select(col("rank"), col("tok"), col("n_occurrences"), col("doc_freq"))
  }

  def vocabulary(spark: SparkSession, dir: String): DataFrame =
    vocabularyOf(Catalog.documents(spark, dir)).orderBy(col("rank"))

  // ---------------------------------------------------------------------
  // X12 — adjacent-pair frequencies: the statistic ONE round of BPE/
  // WordPiece merge selection is computed from (most-frequent adjacent
  // pair wins), and the bigram table for phrase-vocabulary induction —
  // x9's vocabulary extended from tokens to transitions. Pairs never
  // span document boundaries.
  //
  // Plan shape: pairing is slice + arrays_zip over the already-split
  // token array — built-in codegen'd expressions, not an interpreted
  // lambda, and crucially NOT a positional self-join (the b4 trick is
  // right for probing few terms; for ALL transitions it would shuffle
  // the whole position relation twice). The only shuffle is the partial-
  // aggregated (t1, t2) count relation — vocabulary-squared bounded in
  // theory, Heaps-law bounded in practice — and the top-N is a
  // TakeOrdered, never a global sort.
  // ---------------------------------------------------------------------
  def mergePairsOf(docs: DataFrame, topN: Int = VocabTopN): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = toks
      .select(explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("p"))
      .select(col("p.0").as("t1"), col("p.1").as("t2"))
    pairs.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("t1"), col("t2"))
      .limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("t1"), col("t2"))))
      .select(col("rank"), col("t1"), col("t2"), col("n_occurrences"))
  }

  def mergePairs(spark: SparkSession, dir: String): DataFrame =
    mergePairsOf(Catalog.documents(spark, dir)).orderBy(col("rank"))

  // ---------------------------------------------------------------------
  // X18 — iterated BPE vocabulary INDUCTION (Sennrich et al. 2016): x12
  // gives exactly one merge-selection round; this is the LOOP — select
  // the most frequent adjacent symbol pair, merge every (greedy,
  // left-to-right, non-overlapping) occurrence corpus-wide into one
  // symbol, recount, repeat. Each merge changes the next round's counts
  // (merged symbols form new pairs; constituent pairs vanish), which is
  // precisely what one static top-N table cannot express — the spec pins
  // a corpus where round 2's winner does not even EXIST in round 1's
  // table. (Round-11 verdict "what's missing" item: the full induction
  // loop over x12's round.)
  //
  // Representation: each document renders as a delimiter-wrapped symbol
  // string — chr(1) t chr(1) per symbol, concatenated — so one literal
  // (non-regex) `replace` of chr(1)·t1·chr(1)chr(1)·t2·chr(1) IS the
  // greedy non-overlapping merge: both engines' replace scans left to
  // right, a match consumes only its own wrappers (each neighbor still
  // owns one), and "a a a" merges the LEFT pair only — exact BPE
  // semantics with zero interpreted lambdas. Merged symbols join with
  // chr(2), so a merged "a·b" can never collide with a literal token
  // "ab". The rendering REQUIRES corpus text carry no chr(1)/chr(2) —
  // true of any real text corpus — and [[guardedText]] enforces it: a
  // violating row raises at render time (one cheap codegen'd contains()
  // per row) instead of producing consistently-wrong merges the oracle
  // could never distinguish, since both engines would corrupt
  // identically (r12 ADVICE). A production build would escape rather
  // than reject.
  //
  // Plan/scale: each round is ONE codegen'd corpus map (the replace) +
  // x12's partial-aggregated pair count (vocabulary-bounded shuffle) +
  // a 1-ROW argmax to the driver — the Pregel superstep shape (k1), with
  // per-round localCheckpoint cutting the lineage the loop would
  // otherwise double. Real tokenizer builds run thousands of merges; a
  // deployment batches K non-interacting winners per round (the
  // standard scalable variant) — the gate registers the loop mechanics
  // at [[BpeMergeRounds]] rounds, the oracle unrolls the same rounds in
  // SQL (the k1-oracle precedent).
  // ---------------------------------------------------------------------
  val BpeMergeRounds = 4
  private val SymSep = "\u0001"
  private val SymJoin = "\u0002"

  /** `text`, or a loud failure when it carries a delimiter byte the symbol
    * rendering reserves — the silent-corruption guard the header describes.
    */
  private def guardedText: Column =
    when(col("text").contains(SymSep) || col("text").contains(SymJoin),
      raise_error(concat(lit("BPE symbol rendering: text of doc_id="),
        col("doc_id").cast("string"),
        lit(" contains a reserved delimiter byte (\\u0001/\\u0002)"))))
      .otherwise(col("text"))

  /** The merge table: (merge_rank, t1, t2, n_occurrences) — symbols as
    * selected, in selection order; merged symbols carry the chr(2)
    * joiner.
    */
  def bpeInductionOf(docs: DataFrame,
      rounds: Int = BpeMergeRounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus = docs
      .filter(col("text").isNotNull)
      .select(concat(lit(SymSep),
        array_join(tokens(guardedText), SymSep + SymSep),
        lit(SymSep)).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val tk = corpus
        .select(split(trim(col("s"), SymSep), SymSep + SymSep).as("tk"))
        .filter(size(col("tk")) >= 2)
      val top = tk.select(explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1))).as("p"))
        .select(col("p.0").as("t1"), col("p.1").as("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val t1 = top(0).getString(0)
        val t2 = top(0).getString(1)
        merges += ((r + 1, t1, t2, top(0).getLong(2)))
        corpus = corpus.select(replace(col("s"),
            lit(SymSep + t1 + SymSep + SymSep + t2 + SymSep),
            lit(SymSep + t1 + SymJoin + t2 + SymSep)).as("s"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "t1", "t2", "n_occurrences")
      .orderBy(col("merge_rank"))
  }

  /** Artifact format tag — bump when the symbol rendering, joiner, or
    * round count changes.
    */
  private val BpeMergesVersion = s"rounds$BpeMergeRounds-sep1-join2-v1"

  /** The induced merge table PERSISTED per corpus via [[graft.Scratch]]
    * (round-12 review finding: x19 re-ran the whole 4-round induction —
    * 4 corpus aggregates + driver argmaxes — on every invocation; the
    * merge table is content-determined exactly like c11's fk_distinct
    * relation, so it gets the same treatment). This is also the honest
    * deployment shape: the merge table IS the trained tokenizer
    * artifact an encoder loads, never re-derives per query.
    */
  def bpeMergesIndexed(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.Scratch.materialize(spark, "bpe_merges",
      BpeMergesVersion, dir)(staging =>
      bpeInductionOf(Catalog.documents(spark, dir)).write.parquet(staging))
    graft.Catalog.readStable(spark, p)
  }

  /** Bench warmup hook (the Dedup.prewarmIndexes precedent). */
  def prewarmIndexes(spark: SparkSession, dir: String): Unit = {
    bpeMergesIndexed(spark, dir)
    ()
  }

  def bpeInduction(spark: SparkSession, dir: String): DataFrame =
    bpeMergesIndexed(spark, dir).orderBy(col("merge_rank"))

  // ---------------------------------------------------------------------
  // X19 — BPE ENCODE: apply the induced merge table to the corpus — the
  // other half of the tokenizer story (x18 induces, x19 tokenizes) and
  // the statistic a tokenizer owner actually reviews: per-document
  // compression (tokens in, symbols out, merges applied — "fertility"
  // in the tokenizer literature is the inverse ratio). Applying merges
  // 1..N in rank order to the ORIGINAL rendering reproduces exactly the
  // induction's final corpus state (each replace is the identical
  // operation the induction performed), and is precisely how a trained
  // BPE encodes unseen text.
  //
  // Plan/scale: the merge table is driver-side (N rows — the trained
  // artifact every encoder ships); the N replaces compose into ONE
  // codegen'd projection chain over a single corpus scan — encode is a
  // map-only pass, no shuffle at all beyond the presentation sort. The
  // induce step reuses x18's machinery (its cost is the offline build;
  // a deployment loads the persisted merge table instead).
  // ---------------------------------------------------------------------
  /** ENCODE with an explicit merge table (rank order) — the deployment
    * form: a trained encoder loads its merges, it never re-derives them.
    */
  def applyMergesOf(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(guardedText).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("n_tokens"),
        concat(lit(SymSep), array_join(col("tk"), SymSep + SymSep),
          lit(SymSep)).as("s"))
    val encoded = merges.foldLeft(base) { case (df, (t1, t2)) =>
      df.withColumn("s", replace(col("s"),
        lit(SymSep + t1 + SymSep + SymSep + t2 + SymSep),
        lit(SymSep + t1 + SymJoin + t2 + SymSep)))
    }
    encoded
      .select(col("doc_id"), col("n_tokens"),
        size(split(trim(col("s"), SymSep), SymSep + SymSep)).as("n_symbols"))
      .withColumn("merges_applied", col("n_tokens") - col("n_symbols"))
      .orderBy(col("doc_id"))
  }

  /** Spec form over an explicit frame: induce then apply. */
  def bpeEncodeOf(docs: DataFrame, rounds: Int = BpeMergeRounds): DataFrame =
    applyMergesOf(docs, bpeInductionOf(docs, rounds).collect().toSeq
      .map(r => (r.getString(1), r.getString(2))))

  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    applyMergesOf(Catalog.documents(spark, dir),
      bpeMergesIndexed(spark, dir).orderBy(col("merge_rank")).collect().toSeq
        .map(r => (r.getString(1), r.getString(2))))

  /** Oracle: the shared chain's FINAL corpus state, accounted per doc. */
  val bpeEncodeSql: String =
    s"""WITH $bpeChainCtesSql
       |SELECT r.doc_id,
       | CAST(len(string_split_regex(lower(trim(d.text)), '\\s+')) AS INT)
       |   AS n_tokens,
       | CAST(len(string_split(trim(r.s, chr(1)), chr(1)||chr(1))) AS INT)
       |   AS n_symbols,
       | CAST(len(string_split_regex(lower(trim(d.text)), '\\s+'))
       |   - len(string_split(trim(r.s, chr(1)), chr(1)||chr(1))) AS INT)
       |   AS merges_applied
       |FROM r$BpeMergeRounds r JOIN documents d USING (doc_id)
       |ORDER BY r.doc_id""".stripMargin.replace('\n', ' ')

  /** The r0..rN CTE chain shared by the x18 and x19 oracles: r0 renders
    * every document as its wrapped symbol string (doc_id threaded so the
    * encode oracle can account per document; the induction oracle just
    * ignores it), each round re-splits, pair-counts, takes the 1-row
    * argmax, and applies the literal replace.
    */
  private def bpeChainCtesSql: String = {
    val w1 = "chr(1)"
    val roundCtes = (0 until BpeMergeRounds).map { i =>
      s"""tk$i AS (SELECT string_split(trim(s, $w1), $w1||$w1) AS tk FROM r$i),
         |p$i AS (SELECT tk[pos] AS t1, tk[pos + 1] AS t2,
         |   CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT tk, unnest(range(1, len(tk))) AS pos
         |       FROM tk$i WHERE len(tk) >= 2)
         | GROUP BY 1, 2),
         |w$i AS (SELECT t1, t2, n FROM p$i ORDER BY n DESC, t1, t2 LIMIT 1),
         |r${i + 1} AS (SELECT doc_id,
         |   CASE WHEN w.t1 IS NULL THEN s ELSE replace(s,
         |     $w1 || w.t1 || $w1 || $w1 || w.t2 || $w1,
         |     $w1 || w.t1 || chr(2) || w.t2 || $w1) END AS s
         | FROM r$i LEFT JOIN w$i w ON TRUE)"""
        .stripMargin
    }.mkString(",\n")
    s"""r0 AS (
       | SELECT doc_id, $w1 || array_to_string(
       |   string_split_regex(lower(trim(text)), '\\s+'), $w1||$w1) || $w1 AS s
       | FROM documents WHERE text IS NOT NULL),
       |$roundCtes""".stripMargin
  }

  /** Oracle: the same rounds UNROLLED as CTEs (recursive CTEs forbid
    * aggregates in the recursive term — the k1-oracle constraint), each
    * round = re-split, pair count, 1-row argmax, literal replace.
    */
  val bpeInductionSql: String = {
    val winners = (0 until BpeMergeRounds)
      .map(i => s"SELECT ${i + 1} AS merge_rank, t1, t2," +
        s" n AS n_occurrences FROM w$i")
      .mkString(" UNION ALL ")
    s"""WITH $bpeChainCtesSql
       |SELECT * FROM ($winners) ORDER BY merge_rank"""
      .stripMargin.replace('\n', ' ')
  }

  val mergePairsSql: String =
    s"""WITH base AS (
       | SELECT string_split_regex(lower(trim(text)), '\\s+') AS tk
       | FROM documents WHERE text IS NOT NULL),
       |p AS (
       | SELECT tk[pos] AS t1, tk[pos + 1] AS t2
       | FROM (SELECT tk, unnest(range(1, len(tk))) AS pos
       |       FROM base WHERE len(tk) >= 2)),
       |agg AS (SELECT t1, t2, count(*) AS n_occurrences
       | FROM p GROUP BY t1, t2),
       |top AS (SELECT * FROM agg
       | ORDER BY n_occurrences DESC, t1, t2 LIMIT $VocabTopN)
       |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, t1, t2) AS INT) AS rank,
       | t1, t2, n_occurrences
       |FROM top ORDER BY rank""".stripMargin.replace('\n', ' ')

  val vocabularySql: String =
    s"""WITH tok AS (
       | SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       | FROM documents),
       |agg AS (
       | SELECT tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS doc_freq
       | FROM tok WHERE length(tok) > 0 GROUP BY tok),
       |top AS (SELECT * FROM agg ORDER BY n_occurrences DESC, tok LIMIT $VocabTopN)
       |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, tok) AS INT) AS rank,
       | tok, n_occurrences, doc_freq
       |FROM top ORDER BY rank""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X10 — language-model scoring: per-document mean token surprisal under
  // a unigram LM fitted on the corpus itself — the perplexity-filter
  // shape (CCNet/KenLM-style quality filtering, where out-of-distribution
  // documents score high). The LM "fit" is one token-count aggregate; the
  // corpus total joins in as a 1-row broadcast (j7's scalar pattern);
  // scoring joins tokens to their surprisals on the token key —
  // dimension-vs-fact shape (vocabulary grows sub-linearly, Heaps' law),
  // with join selection left to the optimizer like x7.
  //
  // Surprisal is QUANTIZED to whole bits computed in exact integer
  // arithmetic: bits(tok) = floor(log2(T / c)) = bitlength(T DIV c) − 1
  // (2^k ≤ T div c ≤ T/c, and T div c < 2^(k+1) bounds the rational from
  // above). A float formulation — ln(c/T) rounded and decimal-summed —
  // was tried first and FAILED the sf0.1 hash: the JVM's and DuckDB's ln
  // disagree by 1 ulp on some inputs, and no rounding scale makes a
  // transcendental bit-reproducible across engines. Integer bits keep
  // the signal's ordering (rare token → high surprisal) and make every
  // aggregate exact; the one double division (the mean) divides exact
  // integers identically under IEEE on both engines.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // X20 — TF-IDF keyword extraction: the top-K characteristic terms per
  // document — the per-doc summary every corpus browser/labeling UI
  // shows, and the feature b-family retrieval ranks with turned into a
  // document-side digest. IDF in x10's exact integer bits:
  // idf_bits = bitlength(N div df) − 1 = floor(log2(N/df)) — corpus-hot
  // terms (df > N/2) quantize to 0 and drop, which is the stopword
  // filter falling out of the arithmetic rather than a curated list.
  // score = tf · idf_bits, pure integer; top-K per doc by
  // (score desc, token asc) — total order, hash-stable.
  //
  // Plan/scale: tf is one (doc, token) partial-aggregated shuffle of
  // the token relation; df/N are Heaps-bounded dimension aggregates
  // joined on the token key (x10's dimension-vs-fact shape); the top-K
  // window partitions BY DOCUMENT — per-partition state is one doc's
  // vocabulary, never corpus-sized.
  // ---------------------------------------------------------------------
  val KeywordTopK = 3

  def keywordsOf(docs: DataFrame, topK: Int = KeywordTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"),
        (length(bin(expr("n DIV df"))) - 1).cast("long").as("idf_bits"))
      .withColumn("score", col("tf") * col("idf_bits"))
      .filter(col("score") > 0)
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok"))))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
        col("idf_bits"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  def keywords(spark: SparkSession, dir: String): DataFrame =
    keywordsOf(Catalog.documents(spark, dir))

  val keywordsSql: String =
    s"""WITH tok AS (
       | SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       | FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       | FROM tok WHERE length(tok) > 0 GROUP BY 1, 2),
       |dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
       |scored AS (
       | SELECT tf.doc_id, tf.tok, tf.tf,
       |  CAST(length(bin(n // df)) - 1 AS BIGINT) AS idf_bits,
       |  tf.tf * CAST(length(bin(n // df)) - 1 AS BIGINT) AS score
       | FROM tf JOIN dfr USING (tok) CROSS JOIN nn),
       |ranked AS (
       | SELECT doc_id, tok, tf, idf_bits, score,
       |  CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, tok) AS INT) AS rank
       | FROM scored WHERE score > 0)
       |SELECT doc_id, rank, tok, tf, idf_bits, score
       |FROM ranked WHERE rank <= $KeywordTopK
       |ORDER BY doc_id, rank""".stripMargin.replace('\n', ' ')

  /** Quantized-surprisal scoring core over any (doc_id, text) frame
    * (specs inject hand-built ones).
    */
  def lmSurprisalOf(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("t"))
    val bits = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        (length(bin(expr("t DIV c"))) - 1).cast("long").as("bits"))
    tok.join(bits, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_surprisal"))
      .select(col("doc_id"), col("n_tokens"), col("sum_surprisal"),
        round(col("sum_surprisal") / col("n_tokens"), 6).as("avg_surprisal"))
  }

  def lmSurprisal(spark: SparkSession, dir: String): DataFrame =
    lmSurprisalOf(Catalog.documents(spark, dir)).orderBy(col("doc_id"))

  val lmSurprisalSql: String =
    s"""WITH tok AS (
       | SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       | FROM documents),
       |tok2 AS (SELECT * FROM tok WHERE length(tok) > 0),
       |vocab AS (SELECT tok, count(*) AS c FROM tok2 GROUP BY tok),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
       |bits AS (SELECT tok, CAST(length(bin(t // c)) - 1 AS BIGINT) AS bits
       | FROM vocab, tot)
       |SELECT doc_id, count(*) AS n_tokens,
       | CAST(sum(bits) AS BIGINT) AS sum_surprisal,
       | round(CAST(sum(bits) AS BIGINT) / count(*), 6) AS avg_surprisal
       |FROM tok2 JOIN bits USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // X17 — bigram (context-conditioned) surprisal: x10 scores every token
  // against the corpus-wide unigram distribution, which cannot see WORD
  // ORDER — a scrambled document scores exactly like its original. The
  // production perplexity filters (CCNet's KenLM 5-gram) are n-gram
  // models precisely because fluency lives in transitions; x17 is the
  // first context step, P(t2|t1) = c(t1,t2)/c(t1·), fitted on the corpus
  // itself like x10's LM. Within-corpus scoring needs no backoff (every
  // scored bigram has c12 ≥ 1 by construction — a deployment scoring
  // against a FOREIGN reference corpus adds the unigram fallback, x10's
  // relation, for unseen transitions).
  //
  // Determinism: x10's integer-bits rule on the conditional —
  // bits = floor(log2(c1/c12)) = bitlength(c1 div c12) − 1, exact
  // integer arithmetic end to end; the one double division (the mean)
  // divides exact integers identically both engines.
  //
  // Plan shape: bigrams via x12's codegen'd slice+zip kernel (never a
  // positional self-join); the pair-count and left-context aggregates
  // are Heaps-law-bounded relations; scoring joins the per-doc bigram
  // stream to the bits relation on the pair key — x10's dimension-vs-
  // fact shape one order up. Docs with < 2 tokens have no transitions
  // and drop (a length floor is x2's job, not a zero-fill here).
  // ---------------------------------------------------------------------
  /** Bigram-surprisal scoring core over any (doc_id, text) frame. */
  def bigramSurprisalOf(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("p"))
      .select(col("doc_id"), col("p.0").as("t1"), col("p.1").as("t2"))
    val pair = bg.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
    val ctx = pair.groupBy(col("t1")).agg(sum(col("c12")).as("c1"))
    val bits = pair.join(ctx, "t1")
      .select(col("t1"), col("t2"),
        (length(bin(expr("c1 DIV c12"))) - 1).cast("long").as("bits"))
    bg.join(bits, Seq("t1", "t2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_surprisal"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_surprisal"),
        round(col("sum_surprisal") / col("n_bigrams"), 6).as("avg_surprisal"))
  }

  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisalOf(Catalog.documents(spark, dir)).orderBy(col("doc_id"))

  val bigramSurprisalSql: String =
    s"""WITH base AS (
       | SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
       | FROM documents WHERE text IS NOT NULL),
       |p AS (
       | SELECT doc_id, tk[pos] AS t1, tk[pos + 1] AS t2
       | FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS pos
       |       FROM base WHERE len(tk) >= 2)),
       |pair AS (SELECT t1, t2, count(*)::BIGINT AS c12 FROM p GROUP BY 1, 2),
       |ctx AS (SELECT t1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY 1),
       |bits AS (SELECT t1, t2, CAST(length(bin(c1 // c12)) - 1 AS BIGINT) AS bits
       | FROM pair JOIN ctx USING (t1))
       |SELECT doc_id, count(*) AS n_bigrams,
       | CAST(sum(bits) AS BIGINT) AS sum_surprisal,
       | round(CAST(sum(bits) AS BIGINT) / count(*), 6) AS avg_surprisal
       |FROM p JOIN bits USING (t1, t2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  /** Registry of this module's catalogued queries. */
  // ---------------------------------------------------------------------
  // PII redaction (library API, spec-covered): the scrub pass a curation
  // pipeline runs before anything ships — emails, E.164-ish phone
  // numbers, and IPv4 literals replaced with typed placeholder tags, plus
  // per-document match counts for the curation report. Pure
  // `regexp_replace`/`regexp_count`-style column work: codegen'd,
  // zero-shuffle, streams through 100 TB like every other x-op.
  //
  // NOT gate-registered, deliberately: the synthetic fixtures contain no
  // PII (an all-zero oracle proves nothing), and redaction regexes are
  // exactly where Java-regex vs RE2 dialect drift bites cross-engine
  // hashing (the tokens() lesson) — RedactSpec pins the semantics on a
  // constructed corpus instead.
  // ---------------------------------------------------------------------
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9()\\[\\] .-]{6,}[0-9]"
  private val Ipv4Re =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** (redacted text, email count, phone count, ip count) as four columns
    * over `text`. Order matters: emails first (a phone pattern could
    * otherwise eat digit runs inside an address's local part).
    */
  def redact(text: Column): Seq[(String, Column)] = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    val clean = regexp_replace(noIp, PhoneRe, "<PHONE>")
    Seq(
      "redacted" -> clean,
      "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))),
      "n_ips" -> size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))),
      "n_phones" -> size(regexp_extract_all(noIp, lit(PhoneRe), lit(0))))
  }

  /** The per-document redaction pass over a documents table. */
  def redactDocuments(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(col("doc_id") +: redact(col("text")).map {
        case (n, c) => c.as(n)
      }: _*)

  // ---------------------------------------------------------------------
  // X15 — blocklist scrub: the C4 badwords pass generalized — a denylist
  // of terms is scrubbed from the token stream (each hit replaced by a
  // typed tag), with per-document hit accounting and a keep/drop policy
  // verdict. This is the stage PII masking, toxicity word-filters, and
  // content-policy scrubs all instantiate; the regex-based redact() above
  // is its pattern-shaped sibling (spec-only — fixtures carry no PII),
  // while token-exact matching is gate-able: no regex dialect to diverge
  // cross-engine, and the fixture vocabulary contains the pinned terms.
  //
  // Deployment shape: denylists are thousands of terms maintained as a
  // RELATION; the scrub collects them once as bounded query-planning
  // state (one list per policy — the fittedCentroids / b10 discipline)
  // and binds them into the expression, so the pass stays ONE codegen'd
  // scan-side projection — zero shuffle, streams through 100 TB. The
  // token list splits once per row (multi-referenced non-cheap aliases
  // don't collapse into the outer projection — the x2 lesson); scrubbed
  // text is the canonical token-stream rebuild (lowercased,
  // single-space), i.e. scrubbing happens AFTER tokenization exactly as
  // training-data pipelines apply it.
  // ---------------------------------------------------------------------

  /** Pinned gate denylist: two terms present in the fixture vocabulary
    * plus one absent (absence must be a no-op, not an error).
    */
  private[graft] val BlockTerms = Seq("customer", "vector", "forbidden")
  val BlockTag = "<BLOCKED>"

  /** Keep policy: at most this many blocked tokens per million. */
  val BlockDropPpm = 66000L

  /** Token-exact denylist scrub over any relation with (doc_id, text):
    * (doc_id, scrubbed, n_tokens, n_blocked, blocked_ppm, keep). NULL
    * text propagates NULL through every column — policy on unreadable
    * docs belongs to the quality floor, not the scrub.
    */
  def blocklistScrubOf(docs: DataFrame, terms: Seq[String],
      dropPpm: Long = BlockDropPpm): DataFrame = {
    val hit = (t: Column) => t.isInCollection(terms)
    docs
      .select(col("doc_id"), tokens(col("text")).as("l"))
      .select(col("doc_id"),
        array_join(transform(col("l"),
          t => when(hit(t), lit(BlockTag)).otherwise(t)), " ").as("scrubbed"),
        size(col("l")).as("n_tokens"),
        size(filter(col("l"), hit)).as("n_blocked"))
      .select(col("doc_id"), col("scrubbed"), col("n_tokens"), col("n_blocked"),
        expr("(1000000L * n_blocked) div n_tokens").as("blocked_ppm"),
        (expr("(1000000L * n_blocked) div n_tokens") <= dropPpm).as("keep"))
  }

  def blocklistScrub(spark: SparkSession, dir: String): DataFrame =
    blocklistScrubOf(Catalog.documents(spark, dir), BlockTerms)
      .orderBy(col("doc_id"))

  val blocklistScrubSql: String = {
    val terms = BlockTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id,
       |  string_split_regex(lower(trim(text)), '\\s+') AS l FROM documents)
       |SELECT doc_id,
       | array_to_string(list_transform(l,
       |   x -> CASE WHEN x IN ($terms) THEN '$BlockTag' ELSE x END), ' ') AS scrubbed,
       | len(l) AS n_tokens,
       | len(list_filter(l, x -> x IN ($terms))) AS n_blocked,
       | (1000000 * len(list_filter(l, x -> x IN ($terms)))) // len(l) AS blocked_ppm,
       | (1000000 * len(list_filter(l, x -> x IN ($terms)))) // len(l) <= $BlockDropPpm AS keep
       |FROM t ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // X16 — lexical diversity (type-token ratio): distinct tokens over
  // total tokens per document — the standard cheap signal for template/
  // boilerplate detection that x2's counters and x8's repetition stats
  // both miss (a page listing 500 DIFFERENT product names has low
  // repetition but high diversity; a template repeating 20 words has the
  // reverse). Integer ppm for the hash-exact gate; one scan-side
  // projection, zero shuffle (the x-op shape). NULL text → NULL columns.
  // ---------------------------------------------------------------------
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    Catalog.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("l"))
      .select(col("doc_id"),
        size(array_distinct(col("l"))).as("n_types"),
        size(col("l")).as("n_tokens"))
      .select(col("doc_id"), col("n_types"), col("n_tokens"),
        expr("(1000000L * n_types) div n_tokens").as("ttr_ppm"))
      .orderBy(col("doc_id"))

  val lexicalDiversitySql: String =
    """WITH t AS (SELECT doc_id,
      |  string_split_regex(lower(trim(text)), '\s+') AS l FROM documents)
      |SELECT doc_id,
      | len(list_distinct(l)) AS n_types,
      | len(l) AS n_tokens,
      | (1000000 * len(list_distinct(l))) // len(l) AS ttr_ppm
      |FROM t ORDER BY doc_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // Text normalization (library API, spec-covered): the canonicalization
  // a pipeline runs BEFORE fingerprinting/dedup so byte-different
  // renderings of the same text (decomposed accents, zero-width junk,
  // NBSP spacing, case) collapse to one form — see
  // expressions/Normalize.scala for the exact canonical form and why
  // it is NOT gate-registered (the redact precedent: cross-engine
  // Unicode tables don't promise hash equality).
  // ---------------------------------------------------------------------
  /** Codegen'd normalization column ([[graft.expressions.Norm.normText]]). */
  def normalizeText(text: Column): Column =
    graft.expressions.NormalizeFunctions.norm_text(text)

  /** The normalize-then-fingerprint composition d1-style exact dedup
    * should run on dirty corpora: normalization folds rendering noise,
    * the 60-bit hash keys the anti-join.
    */
  def normalizedFingerprint(text: Column): Column =
    hash60(normalizeText(text))

  // ---------------------------------------------------------------------
  // X11 — model-based quality filtering (the fastText / CCNet classifier
  // shape, the one modern curation step x2's hand-written heuristics
  // don't cover): a LINEAR model over hashing-trick bag-of-words features
  // scores every document map-side, and the margin's sign is the
  // keep/drop verdict. The model is a bound weight vector indexed by
  // each token's salted 60-bit feature hash mod D — exactly fastText's
  // bucket table — applied in ONE codegen'd tokenization pass
  // ([[graft.expressions.ClassifierMarginExpr]]): zero shuffle, zero
  // UDF, weights broadcast by closure reference.
  //
  // Integer weights keep the margin EXACT cross-engine (the x10 lesson:
  // float dot products drift by ulps between engines; a real deployment
  // quantizes its trained float weights to integer micro-units the same
  // way b1 quantizes idf). The GATE binds a hash-derived pseudo-model —
  // W[b] = b − (D−1)/2 over D = 2001 buckets, i.e. weight =
  // (hash mod 2001) − 1000 — because the sandbox has no trained model
  // and the DuckDB oracle must recompute the weights from scratch;
  // deployments pass their trained vector to [[classifierScoresOf]]
  // unchanged (ClassifierSpec runs one).
  // ---------------------------------------------------------------------
  val ClassifierBuckets = 2001
  val ClassifierSalt = "w:"

  /** The gate pseudo-model: W[b] = b − 1000 over 2001 buckets. */
  val GateClassifierWeights: Seq[Long] =
    (0 until ClassifierBuckets).map(b => b.toLong - 1000L)

  /** Score `docs` with a bound linear model: margin = Σ W[bucket(token)],
    * keep = margin ≥ 0. NULL text propagates NULL (unscorable, surfaced
    * not swallowed).
    */
  def classifierScoresOf(docs: DataFrame, weights: Seq[Long],
      salt: String = ClassifierSalt): DataFrame =
    docs.select(col("doc_id"),
        graft.expressions.HashFunctions
          .classifier_margin(col("text"), weights, salt).as("margin"))
      .withColumn("keep", col("margin") >= 0)
      .orderBy(col("doc_id"))

  def classifierScores(spark: SparkSession, dir: String): DataFrame =
    classifierScoresOf(Catalog.documents(spark, dir), GateClassifierWeights)

  val classifierScoresSql: String = {
    val d = ClassifierBuckets
    val half = (d - 1) / 2
    s"""WITH m AS (
       | SELECT doc_id,
       |  CAST(list_sum(list_transform(
       |    string_split_regex(lower(trim(text)), '\\s+'),
       |    t -> ${hash60Sql("'" + ClassifierSalt + "' || t")} % $d - $half))
       |   AS BIGINT) AS margin
       | FROM documents)
       |SELECT doc_id, margin, margin >= 0 AS keep
       |FROM m ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // X14 — RAG/embedding chunk MATERIALIZATION: the ingestion step every
  // retrieval pipeline runs before embedding — fixed-size token windows
  // with overlap, so no sentence straddling a cut loses its context.
  // d7/d8 consume chunk HASHES for dedup accounting; this operator emits
  // the chunks THEMSELVES — (doc_id, chunk_id, token offset, length,
  // text) — the relation an embedding job maps and n11's metadata-filter
  // ANN serves. Chunk i covers tokens [i·stride, i·stride + window);
  // every token is covered, the final chunk truncates at the document
  // end, and a document no longer than one window yields exactly one
  // chunk. NULL text has nothing to chunk and is excluded (the
  // unscorable-row contract, x11's rule).
  //
  // Plan/scale shape: tokens split once per document, the chunk count is
  // exact integer arithmetic (ceil via `div` — the x10 rule; no float
  // ceil), fan-out is explode(sequence(…)) and the chunk text a
  // slice + array_join — ONE Generate over a map-side projection, zero
  // shuffle, zero UDF (the terminal ORDER BY is gate presentation only).
  // Chunk rows inherit the document's partitioning, so the downstream
  // embedding pass needs no re-shuffle either.
  // ---------------------------------------------------------------------
  val RagChunkTokens = 32
  val RagChunkStride = 24

  /** Chunk any documents-shaped frame into overlapping token windows. */
  def ragChunksOf(docs: DataFrame,
      window: Int = RagChunkTokens, stride: Int = RagChunkStride): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (uncovered token gaps otherwise)")
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_toks") <= window, lit(1L)).otherwise(
          expr(s"(n_toks - $window + $stride - 1) div $stride + 1")))
    toks
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("tok_start"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("c"))
      .select(col("doc_id"), col("chunk_id"), col("tok_start"),
        size(col("c")).cast("long").as("n_tokens"),
        array_join(col("c"), " ").as("chunk_text"))
  }

  def ragChunks(spark: SparkSession, dir: String): DataFrame =
    ragChunksOf(Catalog.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_id"))

  val ragChunksSql: String = {
    val w = RagChunkTokens
    val s = RagChunkStride
    s"""WITH t AS (
       | SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       | FROM documents WHERE text IS NOT NULL),
       |n AS (
       | SELECT doc_id, toks, len(toks)::BIGINT AS n_toks,
       |  CASE WHEN len(toks) <= $w THEN 1
       |   ELSE (len(toks) - $w + $s - 1) // $s + 1 END AS n_chunks
       | FROM t),
       |c AS (
       | SELECT doc_id, toks,
       |  unnest(generate_series(0, n_chunks - 1))::BIGINT AS chunk_id
       | FROM n)
       |SELECT doc_id, chunk_id, chunk_id * $s AS tok_start,
       | len(list_slice(toks, chunk_id * $s + 1, chunk_id * $s + $w))::BIGINT
       |   AS n_tokens,
       | array_to_string(list_slice(toks, chunk_id * $s + 1, chunk_id * $s + $w), ' ')
       |   AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin.replace('\n', ' ')
  }

  val all: Seq[Q] = Seq(
    Q("x14_rag_chunks", ragChunks, Some(ragChunksSql),
      "RAG chunk materialization: overlapping fixed-token windows per document — exact-integer chunk count, explode(sequence)+slice fan-out, zero shuffle (training-data extension)"),
    Q("x11_classifier_margin", classifierScores, Some(classifierScoresSql),
      "model-based quality filter: hashing-trick linear-classifier margin in exact integer arithmetic, one codegen'd pass (training-data extension)"),
    Q("x10_lm_surprisal", lmSurprisal, Some(lmSurprisalSql),
      "unigram-LM mean surprisal per document — the perplexity-filter shape in exact integer bits (training-data extension)"),
    Q("x17_bigram_surprisal", bigramSurprisal, Some(bigramSurprisalSql),
      "bigram (context-conditioned) surprisal per document: the first " +
        "n-gram step toward the KenLM filter shape — word ORDER enters " +
        "the score where x10's unigram cannot see it; x10's integer-" +
        "bits rule on the conditional c(t1·) div c(t1,t2), x12's " +
        "codegen'd pairing kernel, Heaps-bounded LM relations " +
        "(training-data extension)"),
    Q("x9_vocabulary", vocabulary, Some(vocabularySql),
      "corpus vocabulary: top-N token frequency/doc-frequency table via a two-level algebraic aggregate (training-data extension)"),
    Q("x12_merge_pairs", mergePairs, Some(mergePairsSql),
      "adjacent-token-pair frequencies (the BPE/WordPiece merge-selection statistic): codegen'd slice+zip pairing, one partial-aggregated shuffle of the bigram relation, TakeOrdered top-N (training-data extension)"),
    Q("x20_keywords", keywords, Some(keywordsSql),
      "TF-IDF keyword extraction: top-K characteristic terms per doc, " +
        "IDF in x10's exact integer bits (corpus-hot terms quantize to " +
        "0 and drop — the stopword filter falls out of the arithmetic); " +
        "Heaps-bounded LM relations, per-document top-K window " +
        "(training-data extension)"),
    Q("x19_bpe_encode", bpeEncode, Some(bpeEncodeSql),
      "BPE ENCODE — apply the x18-induced merge table in rank order and " +
        "account per-document compression (tokens in, symbols out, " +
        "merges applied): the N replaces compose into one codegen'd " +
        "map-only projection chain over a single corpus scan; oracle " +
        "reads the shared chain's final corpus state (training-data " +
        "extension)"),
    Q("x18_bpe_induction", bpeInduction, Some(bpeInductionSql),
      "iterated BPE vocabulary induction (Sennrich 2016): the merge LOOP " +
        "over x12's selection round — greedy corpus-wide merge via one " +
        "literal replace per round, recount, repeat; each round is one " +
        "codegen'd map + a vocabulary-bounded pair aggregate + a 1-row " +
        "argmax (the k1 superstep shape), oracle unrolls the same rounds " +
        "(training-data extension)"),
    Q("x8_repetition", repetitionScores, Some(repetitionScoresSql),
      "Gopher-style intra-document repetition signals via a one-pass codegen'd kernel (training-data extension)"),
    Q("x1_token_count", tokenCounts, Some(tokenCountsSql),
      "whitespace + BPE-ish token counting (training-data extension)"),
    Q("x16_ttr", lexicalDiversity, Some(lexicalDiversitySql),
      "lexical diversity (type-token ratio) per document in integer ppm " +
        "— the template/boilerplate signal x2's counters and x8's " +
        "repetition stats miss; one scan-side projection, zero shuffle " +
        "(training-data extension)"),
    Q("x15_blocklist_scrub", blocklistScrub, Some(blocklistScrubSql),
      "token-exact denylist scrub (the C4 badwords / PII-mask stage): " +
        "blocked tokens replaced by a typed tag with per-document hit " +
        "accounting and a ppm keep/drop verdict — one codegen'd scan-side " +
        "projection, denylist bound as query-planning state, zero shuffle " +
        "(training-data extension)"),
    Q("x5_split_assign", splitAssign, Some(splitAssignSql),
      "deterministic hash-bucket train/val/test split assignment (training-data extension)"),
    Q("x6_corpus_accounting", corpusAccounting, Some(corpusAccountingSql),
      "docs/tokens/chars per detected language — corpus rollup (training-data extension)"),
    Q("x2_quality_score", qualityScores, Some(qualityScoresSql),
      "C4/Gopher-style quality signals (training-data extension)"),
    Q("x3_lang_id", langId, Some(langIdSql),
      "marker-stopword language ID (training-data extension)"),
    Q("x4_fingerprint", fingerprints, Some(fingerprintsSql),
      "content + prefix fingerprints via shared 60-bit md5 hash (training-data extension)"))
}
