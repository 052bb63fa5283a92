package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** `bitmap_distinct(bucket, m)` — distinct-count sketch over a bucketed
  * hash as a native Catalyst aggregate with FIXED-SIZE mergeable state.
  *
  * The buffer is an m-bit bitmap (`Array[Long]`, m/8 bytes); `update` sets
  * bit `floorMod(bucket, m)`, `merge` is a word-wise OR, `eval` returns the
  * POPULATION COUNT — the exact number of occupied buckets, i.e. exactly
  * `count(DISTINCT bucket % m)`, which is what the DuckDB oracle computes.
  * That makes the sketch primitive itself oracle-exact: the probabilistic
  * step (linear counting's `-m·ln(1 − V/m)` occupancy inversion, Whang et
  * al. 1990) is a transcendental the consumer applies downstream, kept out
  * of hash-compared output on purpose (the x10 lesson: engines disagree on
  * `ln` by 1 ulp).
  *
  * Scale rationale: `count(DISTINCT key)` shuffles every distinct key to
  * its reducer — at 100 TB the shuffle IS the cost. This aggregate ships a
  * constant m/8 bytes per (partition, group) regardless of cardinality,
  * combines map-side like any algebraic aggregate, and the final state
  * never exceeds m/8 bytes per group. m = 4096 (512 B) keeps linear
  * counting's relative error under ~2% up to ~0.6·m distinct values; size
  * m to the cardinality you need resolved.
  */
case class BitmapDistinct(
    child: Expression,
    numBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = java.lang.Math.floorMod(v.asInstanceOf[Long], numBits.toLong).toInt
      buf(b >>> 6) |= 1L << (b & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var c = 0L
    var i = 0
    while (i < buf.length) { c += java.lang.Long.bitCount(buf(i)); i += 1 }
    c
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct requires a BIGINT bucket, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"
}

object SketchFunctions {
  /** Occupied-bucket count of an m-bit bitmap over `floorMod(c, numBits)`;
    * NULLs ignored (SQL `count(DISTINCT …)` semantics).
    */
  def bitmap_distinct(c: Column, numBits: Int): Column =
    Shims.column(
      BitmapDistinct(Shims.expression(c), numBits).toAggregateExpression())
}
