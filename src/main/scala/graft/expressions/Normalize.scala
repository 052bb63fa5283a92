package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shims

/** Deterministic text normalization — the step a corpus pipeline runs
  * BEFORE fingerprinting/dedup so that byte-different renderings of the
  * same text (decomposed accents, zero-width junk, NBSP layout spacing,
  * case) collapse to one canonical form instead of defeating exact and
  * near-dup matching.
  *
  * Canonical form, in order (the order is load-bearing — see below):
  *   1. zero-width strip — U+200B/U+200C/U+200D/U+FEFF contribute no
  *      rendering and are classic near-dup noise. FIRST, because
  *      removing one can expose a newly adjacent (base, combining-mark)
  *      pair that NFC must then compose — stripping after NFC leaves
  *      such pairs decomposed and breaks idempotence (found by the
  *      idempotence property);
  *   2. ROOT-locale lowercase — pinned locale so an executor's default
  *      (the Turkish dotless-i hazard) can never fork the corpus between
  *      tasks or between runs. BEFORE NFC, because case mappings may
  *      emit decomposed sequences (U+0130 lowers to i + combining dot)
  *      and the NFC that follows re-canonicalizes them;
  *   3. Unicode NFC (composed) — é as U+0065+U+0301 equals U+00E9;
  *   4. whitespace collapse — every `Character.isWhitespace` run plus
  *      NBSP (U+00A0, NOT Java-whitespace but layout spacing in web
  *      text) becomes one space; leading/trailing runs drop entirely.
  *      Space composes with nothing, so collapsing preserves NFC form.
  * The output is a fixed point of the whole chain (idempotence is
  * property-tested): re-normalizing an already-normalized corpus is a
  * no-op, which is what makes the op safe to run defensively.
  *
  * Deliberately NOT gate-registered (the redact precedent, COVERAGE text
  * row): DuckDB's `nfc_normalize`/`lower` follow their own Unicode
  * tables, and a cross-engine hash gate would pin a dialect equality the
  * engines don't promise. Spec-covered instead (NormalizeSpec: hand
  * cases + idempotence property + codegen plan).
  */
object Norm {

  private def isZeroWidth(ch: Char): Boolean =
    ch == '\u200B' || ch == '\u200C' || ch == '\u200D' || ch == '\uFEFF'

  private def isSpacing(ch: Char): Boolean =
    Character.isWhitespace(ch) || ch == '\u00A0'

  /** The kernel, shared by interpreted eval and generated Java. */
  def normText(s: UTF8String): UTF8String = {
    val raw = s.toString
    val stripped = new java.lang.StringBuilder(raw.length)
    var j = 0
    while (j < raw.length) {
      val ch = raw.charAt(j)
      if (!isZeroWidth(ch)) stripped.append(ch)
      j += 1
    }
    val lower = java.text.Normalizer.normalize(
      stripped.toString.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val ch = lower.charAt(i)
      if (isSpacing(ch)) {
        if (sb.length > 0) pendingSpace = true // leading runs drop
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
      }
      i += 1
    } // a trailing run leaves pendingSpace set and unemitted — trimmed
    UTF8String.fromString(sb.toString)
  }
}

/** `norm_text(s STRING): STRING` — whole-stage-codegen'd normalization
  * scalar (static kernel call, same pattern as the hashing expressions).
  */
case class NormText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Norm.normText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Norm.normText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
  override def prettyName: String = "norm_text"
}

/** Column-level entry point. */
object NormalizeFunctions {
  def norm_text(c: Column): Column = Shims.column(NormText(Shims.expression(c)))
}
