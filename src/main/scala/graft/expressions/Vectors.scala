package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels shared by interpreted eval and generated code.
  *
  * Accumulation is sequential left-to-right in double precision — the same
  * order DuckDB's list_cosine_similarity uses, so oracle comparisons agree
  * to the last ulp (and certainly at the 6-decimal rounding the similarity
  * operators emit).
  */
object VecKernels {

  /** Cosine similarity of two float vectors; 0.0 when either norm is 0.
    * Callers (the expressions below) null out length-mismatched inputs
    * before reaching the kernel, so equal lengths are assumed here.
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Per-block L2 norms: block i of m covers elements [i·n/m, (i+1)·n/m).
    * The norm-profile vectors satisfy `cosine(a,b) <= cosine(blockNorms(a),
    * blockNorms(b))` (Cauchy-Schwarz per block: dot(a_i,b_i) ≤ |a_i||b_i|,
    * and |a|₂ = |blockNorms(a)|₂), giving a cheap m-dim upper bound that
    * prunes full-dimension kernel evaluations in threshold searches.
    */
  def blockNorms(a: ArrayData, m: Int): ArrayData = {
    val n = a.numElements()
    val sums = new Array[Double](m)
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      sums(i * m / n) += x * x
      i += 1
    }
    val out = new Array[Float](m)
    i = 0
    while (i < m) { out(i) = math.sqrt(sums(i)).toFloat; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Dot product of two float vectors (double accumulation). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }
}

private[expressions] trait FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null on length mismatch (not silent truncation): corrupt embedding
  // rows must surface as null, not as plausible-looking scores — DuckDB's
  // list_cosine_similarity errors on mismatch, null is our closest
  // non-throwing analogue
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT>, got ${l.catalogString}, ${r.catalogString}")
    }

  protected def kernelCall: String

  protected def kernelEval(a: ArrayData, b: ArrayData): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else kernelEval(av, bv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $kernelCall($a, $b);
         |}
       """.stripMargin)
}

/** `cosine_sim(array<float>, array<float>): double` — codegen'd cosine
  * similarity, the hot kernel of brute-force ANN (builder prompt
  * similarity-search extension).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override protected def kernelCall: String =
    "graft.expressions.VecKernels.cosineFF"
  override protected def kernelEval(a: ArrayData, b: ArrayData): Double =
    VecKernels.cosineFF(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** `dot_product(array<float>, array<float>): double` — codegen'd dot
  * product (LSH hyperplane projections, IVF centroid scoring).
  */
case class DotProduct(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override protected def kernelCall: String =
    "graft.expressions.VecKernels.dotFF"
  override protected def kernelEval(a: ArrayData, b: ArrayData): Double =
    VecKernels.dotFF(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** `block_norms(array<float>, m): array<float>` — per-block L2 norms (see
  * [[VecKernels.blockNorms]]); the m-dim profile whose cosine upper-bounds
  * the full-dimension cosine.
  */
case class BlockNorms(child: Expression, m: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(m >= 1, "block_norms requires m >= 1")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.blockNorms(input.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecKernels.blockNorms($c, $m)")
  override protected def withNewChildInternal(newChild: Expression): BlockNorms =
    copy(child = newChild)
  override def prettyName: String = "block_norms"
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))
  def block_norms(a: Column, m: Int): Column =
    Shims.column(BlockNorms(Shims.expression(a), m))
}
