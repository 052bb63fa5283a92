package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** Session-extension entry point: registers every custom Catalyst
  * expression as a SQL function, so `spark.sql("SELECT size_pretty(b) …")`
  * works cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * For sessions created without the conf (tests, notebooks), call
  * [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.LatestPerKeyRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.2", "", "scala_udf")

  private def one(f: Expression => Expression): Seq[Expression] => Expression =
    es => f(es.head)

  /** Resolve an integral-literal SQL argument. `eval()` on an arbitrary
    * expression would NPE on NULL and throw unresolved-expression errors on
    * column arguments — reject everything but a plain integral literal with
    * a proper message instead.
    */
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Byte, _)  => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)   => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)  =>
      if (v != v.toInt.toLong) throw new IllegalArgumentException(
        s"$fn expects an INT-range literal, got $v")
      else v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("size_pretty", info("size_pretty",
      "size_pretty(bytes) - human-readable 1024-based size"),
      one(SizePretty)),
    ("format_duration", info("format_duration",
      "format_duration(seconds) - H:MM:SS rendering"),
      one(FormatDuration)),
    ("simhash60", info("simhash60",
      "simhash60(array<bigint>) - 60-bit SimHash of feature hashes"),
      one(SimHash60)),
    ("shingle_hash60", info("shingle_hash60",
      "shingle_hash60(text[, k]) - distinct 60-bit k-word-shingle hashes"),
      es => es match {
        case Seq(text) => ShingleHash60(text, 3)
        case Seq(text, k) => ShingleHash60(text, intLit(k, "shingle_hash60"))
        case _ => throw new IllegalArgumentException(
          "shingle_hash60 expects (text) or (text, k)")
      }),
    ("winnow_fingerprints", info("winnow_fingerprints",
      "winnow_fingerprints(text[, k, w]) - winnowing rolling-hash document fingerprints"),
      es => es match {
        // one-arg default = the d5 engine constants (k=24 noise-resistant
        // grams, w=8 windows) — the round-6 verdict caught these swapped
        // (8, 16), which produced fingerprints that collide on small
        // vocabularies and never match the persisted winnow index
        case Seq(text) => WinnowFingerprints(text,
          graft.operators.Dedup.WinnowK, graft.operators.Dedup.WinnowW)
        case Seq(text, k, w) => WinnowFingerprints(text,
          intLit(k, "winnow_fingerprints"), intLit(w, "winnow_fingerprints"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints expects (text) or (text, k, w)")
      }),
    ("cosine_sim", info("cosine_sim",
      "cosine_sim(array<float>, array<float>) - cosine similarity"),
      es => CosineSimilarity(es(0), es(1))),
    ("dot_product", info("dot_product",
      "dot_product(array<float>, array<float>) - dot product"),
      es => DotProduct(es(0), es(1))),
    ("block_norms", info("block_norms",
      "block_norms(array<float>[, m]) - per-block L2 norms (cosine upper-bound profile)"),
      es => es match {
        case Seq(v) => BlockNorms(v, 8)
        case Seq(v, m) => BlockNorms(v, intLit(m, "block_norms"))
        case _ => throw new IllegalArgumentException(
          "block_norms expects (vector) or (vector, m)")
      }),
    ("lang_id", info("lang_id",
      "lang_id(text) - marker-stopword language identification"),
      one(LangIdExpr(_, graft.operators.TextOps.LangMarkers.map(_._1),
        graft.operators.TextOps.LangMarkers.map(_._2)))),
    ("quality_stats", info("quality_stats",
      "quality_stats(text) - struct<n_tokens, stop_hits, punct_chars, n_chars> quality counters"),
      one(QualityStatsExpr(_, graft.operators.TextOps.Stopwords))),
    ("norm_text", info("norm_text",
      "norm_text(text) - zero-width strip + ROOT-locale lowercase + NFC + whitespace collapse (in that order)"),
      one(NormText)),
    ("window_hash60", info("window_hash60",
      "window_hash60(text[, k]) - positional 60-bit k-word window hashes (overlapping, duplicates kept)"),
      es => es match {
        // one-arg default = the d8 engine constant (SpanTokens, the
        // exact-substring-dedup window the only engine consumer uses) —
        // the winnow_fingerprints lesson: a mismatched default makes SQL
        // streams silently join nothing against the persisted relation
        case Seq(text) => WindowHash60(text, graft.operators.Dedup.SpanTokens)
        case Seq(text, k) => WindowHash60(text, intLit(k, "window_hash60"))
        case _ => throw new IllegalArgumentException(
          "window_hash60 expects (text) or (text, k)")
      }),
    ("cdc_boundaries", info("cdc_boundaries",
      "cdc_boundaries(hex_text[, w, d]) - content-defined chunk boundary byte positions over a hex payload rendering"),
      es => es match {
        case Seq(hx) => CdcBoundariesExpr(hx,
          graft.operators.Multimodal.CdcWindow,
          graft.operators.Multimodal.CdcDivisor.toLong)
        case Seq(hx, w, d) => CdcBoundariesExpr(hx,
          intLit(w, "cdc_boundaries"), intLit(d, "cdc_boundaries").toLong)
        case _ => throw new IllegalArgumentException(
          "cdc_boundaries expects (hex_text) or (hex_text, w, d)")
      }))

  /** Imperative registration for an existing session: the SQL functions
    * AND the optimizer rule, so conf-less sessions get the same plans as
    * `spark.sql.extensions=graft.GraftExtensions` ones.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    definitions.foreach { case (name, i, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      val _ = i
    }
    Seq(graft.plans.LatestPerKeyRewrite, graft.plans.RangeJoinRewrite)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
  }
}
