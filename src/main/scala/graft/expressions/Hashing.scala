package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing kernels shared by interpreted eval and generated code. */
object Hash {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct 60-bit hashes of the k-word shingles of a text, in one pass:
    * tokenize (trim → lower → split \s+, matching Spark's
    * `split(lower(trim(text)), "\\s+")`), slide a k-window, md5 each
    * shingle and keep the first 60 bits (exactly [[graft.operators.TextOps.hash60]]:
    * first 15 hex chars of md5 as a BIGINT), dedupe.
    *
    * Exists because the equivalent `transform(sequence(...), element_at…)`
    * expression tree re-evaluates the regex split per element in Spark's
    * interpreted higher-order functions — O(tokens²) regex work per row and
    * no codegen. This kernel is O(text) and whole-stage-codegen friendly.
    */
  def shingleHash60(text: UTF8String, k: Int): ArrayData = {
    val toks = Ws.split(text.trim().toLowerCase().toString)
    if (toks.length < k) return ArrayData.toArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(md5Prefix60(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    ArrayData.toArrayData(out)
  }

  /** First 60 bits of md5(utf8(s)) — first 15 hex chars as a BIGINT. */
  def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 60-bit SimHash over an array of 60-bit feature hashes: bit j of the
    * result is set iff strictly more features have bit j set than clear.
    * Null elements are skipped. Deterministic and order-insensitive, so
    * Spark and the DuckDB oracle agree regardless of row order.
    */
  def simhash60(hashes: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `simhash60(array<bigint>): bigint` — custom Catalyst expression with
  * whole-stage codegen; the per-document reduction of MinHash-free
  * near-dup fingerprinting (SimHash, Charikar 2002).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Hash.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}

/** `shingle_hash60(text, k): array<bigint>` — distinct 60-bit k-shingle
  * hashes in one codegen'd pass (see [[Hash.shingleHash60]]).
  */
case class ShingleHash60(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Hash.shingleHash60(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash.shingleHash60($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
  override def prettyName: String = "shingle_hash60"
}

object HashFunctions {
  def simhash60(c: Column): Column = Shims.column(SimHash60(Shims.expression(c)))
  def shingle_hash60(c: Column, k: Int): Column =
    Shims.column(ShingleHash60(Shims.expression(c), k))
}
