package graft.expressions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shims

/** Shared formatting kernels, called both from interpreted eval and from
  * whole-stage-generated Java (a static call keeps the expression inside
  * WholeStageCodegen instead of falling back to CodegenFallback).
  */
object Fmt {
  private val units = Array("B", "KB", "MB", "GB", "TB", "PB", "EB")

  /** Integral input types the formatting expressions accept (generated
    * Java widens them to long at the static call site).
    */
  val integralTypes: Set[DataType] = Set[DataType](
    org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
    org.apache.spark.sql.types.IntegerType, LongType)

  /** Human-readable byte size, 1024-based, one decimal above bytes.
    * Mirrors the intent of PostgreSQL's `pg_size_pretty` used by the
    * reference's storage queries (reference `myapp/views.py:427-428,464`);
    * exact unit ladder documented here because Spark has no built-in.
    */
  def sizePretty(bytes: Long): UTF8String = {
    val neg = bytes < 0
    var v = math.abs(bytes.toDouble)
    var i = 0
    while (v >= 1024.0 && i < units.length - 1) { v /= 1024.0; i += 1 }
    // C-printf %.1f semantics (what DuckDB's printf renders): round the
    // BINARY double half-to-even. Java's String.format %.1f rounds the
    // decimal representation HALF_UP instead, so exact .x25 ties (e.g.
    // 1310720 bytes = 1.25 MB) would render 1.3 here and 1.2 in the
    // oracle. new BigDecimal(double) is the exact binary expansion.
    val s =
      if (i == 0) s"${bytes.abs} ${units(0)}"
      else new java.math.BigDecimal(v)
        .setScale(1, java.math.RoundingMode.HALF_EVEN)
        .toPlainString + " " + units(i)
    UTF8String.fromString(if (neg) "-" + s else s)
  }

  /** Render a duration in whole seconds as `H:MM:SS` (hours unbounded),
    * mirroring how the reference displays `now() - query_start` intervals
    * (reference `myapp/views.py:402,414`). Negative durations render with a
    * leading minus, matching PG interval text.
    */
  def formatDuration(seconds: Long): UTF8String = {
    val neg = seconds < 0
    val s = math.abs(seconds)
    val h = s / 3600
    val m = (s % 3600) / 60
    val sec = s % 60
    UTF8String.fromString(
      (if (neg) "-" else "") + f"$h%d:$m%02d:$sec%02d")
  }
}

/** `size_pretty(bytes LONG): STRING` — custom scalar Catalyst expression with
  * whole-stage codegen (SURVEY.md §4 custom item 1).
  */
case class SizePretty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Fmt.integralTypes(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${child.dataType.catalogString}")
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Fmt.sizePretty(input.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Fmt.sizePretty($c)")
  override protected def withNewChildInternal(newChild: Expression): SizePretty =
    copy(child = newChild)
  override def prettyName: String = "size_pretty"
}

/** `format_duration(seconds LONG): STRING` — custom scalar Catalyst expression
  * with whole-stage codegen (SURVEY.md §4 custom item 2).
  */
case class FormatDuration(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Fmt.integralTypes(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${child.dataType.catalogString}")
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Fmt.formatDuration(input.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Fmt.formatDuration($c)")
  override protected def withNewChildInternal(newChild: Expression): FormatDuration =
    copy(child = newChild)
  override def prettyName: String = "format_duration"
}

/** Column-level entry points for the custom expressions. */
object functions {
  def size_pretty(c: Column): Column =
    Shims.column(SizePretty(Shims.expression(c)))
  def format_duration(c: Column): Column =
    Shims.column(FormatDuration(Shims.expression(c)))
}
