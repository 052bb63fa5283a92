package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

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

/** `bloom_build(key, m, k)` — build an m-bit Bloom filter over BIGINT keys
  * as a native Catalyst aggregate with FIXED-SIZE mergeable state: `update`
  * sets the key's k probe bits ([[Hash.bloomSet]], the same double-hashing
  * family [[BloomMightContain]] probes), `merge` is a word-wise OR, `eval`
  * returns the m/64 words as `array<bigint>`.
  *
  * This is the build half of SEMI-JOIN REDUCTION: instead of shuffling a
  * huge probe side into an anti/semi join, build the filter over the
  * (smaller) build side in one aggregate pass — m/8 bytes per (partition,
  * group) regardless of cardinality, combining map-side like any algebraic
  * aggregate — then bind the words into a codegen'd probe that lets
  * definitely-absent rows skip the join entirely. Only "maybe" rows (true
  * hits + the filter's false positives) reach the exact join, so results
  * stay EXACT. NULL keys are ignored (they never equi-join anyway).
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numProbes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numProbes >= 1, s"numProbes must be >= 1, got $numProbes")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Hash.bloomSet(buf, v.asInstanceOf[Long], numBits, numProbes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires a BIGINT key, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_build"
}

/** `topk_threshold(key, id, k)` — the LARGEST of the k lexicographically
  * smallest (key, id) pairs per group, as a native Catalyst aggregate with
  * BOUNDED mergeable state (a size-k max-heap, ≤ 16·k bytes per
  * (partition, group)).
  *
  * This is the quota-sampling primitive: "keep each stratum's k smallest
  * sample keys" needs only the k-th smallest pair per stratum — rows then
  * keep/drop themselves by comparing their own (key, id) against the
  * threshold, with no per-row rank state. The id is the tiebreak, so the
  * order is TOTAL over distinct rows and the kept set is exactly the
  * window form's `row_number() OVER (ORDER BY key, id) <= k` — the two
  * formulations are provably the same set, but this one never shuffles
  * the data rows: partial heaps combine map-side like any algebraic
  * aggregate, and only ≤ k pairs per (partition, stratum) move. A window
  * would shuffle the entire corpus by stratum and sort each group — at
  * 100 TB with a handful of language strata that is a few reducers
  * sorting terabytes each; the heap ships kilobytes.
  *
  * Groups with fewer than k rows return their maximum pair, so
  * `(key, id) <= threshold` keeps every row — "quota not reached" needs
  * no special case downstream. NULL key or id rows are ignored (they have
  * no place in the total order); an all-NULL group returns NULL.
  */
case class TopKPairThreshold(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairThreshold.Heap]
  with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): TopKPairThreshold.Heap =
    new TopKPairThreshold.Heap(k)

  override def update(
      buf: TopKPairThreshold.Heap, input: InternalRow): TopKPairThreshold.Heap = {
    val kv = left.eval(input)
    val iv = right.eval(input)
    if (kv != null && iv != null)
      buf.offer(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: TopKPairThreshold.Heap, b: TopKPairThreshold.Heap): TopKPairThreshold.Heap = {
    val it = b.pq.iterator()
    while (it.hasNext) { val p = it.next(); a.offer(p(0), p(1)) }
    a
  }

  override def eval(buf: TopKPairThreshold.Heap): Any = {
    val top = buf.pq.peek()
    if (top == null) null else InternalRow(top(0), top(1))
  }

  override def serialize(buf: TopKPairThreshold.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.pq.size() * 16)
    bb.putInt(buf.pq.size())
    val it = buf.pq.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairThreshold.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKPairThreshold.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairThreshold =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairThreshold =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairThreshold =
    copy(left = newLeft, right = newRight)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_threshold requires BIGINT (key, id), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def nullable: Boolean = true
  override def dataType: DataType =
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("id", LongType, nullable = false)))
  override def prettyName: String = "topk_threshold"
}

object TopKPairThreshold {
  /** A size-bounded MAX-heap of (key, id) pairs under lexicographic order:
    * after any sequence of offers it holds the k smallest pairs seen, with
    * the largest of those at the root. Offer is O(log k); state is ≤ k
    * two-long arrays regardless of input size.
    */
  final class Heap(val k: Int) {
    val pq = new java.util.PriorityQueue[Array[Long]](
      math.max(1, k),
      new java.util.Comparator[Array[Long]] {
        // reversed compare → max-heap
        def compare(a: Array[Long], b: Array[Long]): Int = {
          val c = java.lang.Long.compare(b(0), a(0))
          if (c != 0) c else java.lang.Long.compare(b(1), a(1))
        }
      })
    def offer(key: Long, id: Long): Unit = {
      if (pq.size() < k) { pq.add(Array(key, id)); () }
      else {
        val top = pq.peek()
        if (key < top(0) || (key == top(0) && id < top(1))) {
          pq.poll(); pq.add(Array(key, id)); ()
        }
      }
    }
  }
}

/** `heavy_hitters(key, k)` — Misra-Gries frequent-elements sketch over
  * string keys as a native Catalyst aggregate with BOUNDED mergeable
  * state: at most k (key, counter) pairs per buffer, ever.
  *
  * Update is the classic MG step (Misra & Gries 1982): increment a
  * present key, insert while fewer than k counters, otherwise decrement
  * ALL counters and drop zeros. Merge follows Agarwal et al. 2013
  * ("Mergeable Summaries"): sum counters pointwise, and if more than k
  * keys survive, subtract the (k+1)-th largest count from every counter
  * and drop non-positives — the result carries the SAME deterministic
  * guarantee as a single-pass sketch:
  *
  *   true_count − n/(k+1)  ≤  counter  ≤  true_count
  *
  * so every key with true frequency above n/(k+1) is GUARANTEED present
  * (the gate pins exactly this claim as data; no probabilistic step, no
  * hash family, nothing engine-divergent). `eval` emits the surviving
  * pairs key-sorted as array<struct<key,est>>.
  *
  * Scale rationale: exact top-k-by-frequency is a full groupBy — at
  * 100 TB the distinct-key shuffle IS the cost (the a9 argument for
  * cardinality, replayed for frequency). This aggregate ships ≤ k pairs
  * per (partition, group) regardless of cardinality and combines
  * map-side; k trades memory for the frequency floor you can certify.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all: the step that buys the n/(k+1) guarantee
          val dead = List.newBuilder[String]
          buf.foreach { case (ky, c) =>
            if (c == 1L) dead += ky else buf.update(ky, c - 1)
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (ky, c) => a.update(ky, a.getOrElse(ky, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = List.newBuilder[String]
      a.foreach { case (ky, c) =>
        if (c - cut <= 0L) dead += ky else a.update(ky, c - cut)
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      sorted.map { case (ky, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(ky), c)
      })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toArray
    val keys = entries.map(_._1.getBytes("UTF-8"))
    val bb = ByteBuffer.allocate(
      4 + keys.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(keys).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf()
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      buf.update(new String(kb, "UTF-8"), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HeavyHitters =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHitters =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a STRING key, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StructType(Seq(
      StructField("key", org.apache.spark.sql.types.StringType),
      StructField("est", LongType))), containsNull = false)
  override def prettyName: String = "heavy_hitters"
}

/** `cms_build(keyHash, width, divisors)` — Count-Min sketch (Cormode &
  * Muthukrishnan 2005) over BIGINT key hashes as a native Catalyst
  * aggregate with FIXED-SIZE mergeable state: a depth×width counter
  * matrix flattened row-major into `Array[Long]`. Each update increments
  * one cell per row; merge is element-wise sum; `eval` emits the matrix
  * as `array<bigint>` for scan-side probing (the bloom_build shape:
  * build in one aggregate pass, probe via broadcast binding).
  *
  * POINT-QUERY estimate = min over rows of the probed cell, computed by
  * the consumer with `element_at`/`least` — never under the true count,
  * over by at most the colliding keys' mass in the best row.
  *
  * Determinism (the bitmap_distinct philosophy — the sketch primitive
  * itself is oracle-exact): row d's bucket is `(h div divisors(d)) % w`,
  * the link-graph divisor family, NOT a salted multiply-shift — so a SQL
  * oracle recomputes every cell as an exact collision-group SUM and the
  * ESTIMATE is gate-comparable as a value, not merely banded. The
  * probabilistic ε–δ dial of a salted family is traded for exact
  * replayability; row independence is weaker, which the min over rows
  * tolerates (estimates stay upper bounds regardless).
  *
  * Scale rationale: exact per-key counts shuffle every distinct key (the
  * a9/a10 argument) — this ships depth·width·8 bytes per (partition,
  * group) regardless of cardinality and combines map-side; width trades
  * memory for collision mass (~n/width expected overcount per row).
  * Negative inputs are rejected by the divisor rule (`div` truncates
  * toward zero, SQL `//` floors — they diverge below zero), which the
  * 60-bit non-negative [[Hash]] family satisfies by construction; NULL
  * keys are ignored.
  */
case class CountMinBuild(
    child: Expression,
    width: Int,
    divisors: Seq[Long],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width > 0, s"width must be positive, got $width")
  require(divisors.nonEmpty && divisors.forall(_ > 0),
    s"divisors must be positive, got $divisors")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](divisors.length * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L,
        s"cms_build requires a non-negative key hash, got $h")
      var d = 0
      while (d < divisors.length) {
        buf(d * width + ((h / divisors(d)) % width).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CountMinBuild =
    copy(child = newChild)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_build requires a BIGINT key hash, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_build"
}

object SketchFunctions {
  /** Occupied-bucket count of an m-bit bitmap over `floorMod(c, numBits)`;
    * NULLs ignored (SQL `count(DISTINCT …)` semantics).
    */
  def bitmap_distinct(c: Column, numBits: Int): Column =
    Shims.column(
      BitmapDistinct(Shims.expression(c), numBits).toAggregateExpression())

  /** Bloom-filter words over BIGINT keys — the build half of semi-join
    * reduction; probe with [[HashFunctions.bloom_might_contain]]. NULLs
    * ignored. See [[BloomBuild]].
    */
  def bloom_build(c: Column, numBits: Int, numProbes: Int): Column =
    Shims.column(
      BloomBuild(Shims.expression(c), numBits, numProbes).toAggregateExpression())

  /** The largest of the k lexicographically smallest (key, id) pairs —
    * a struct {k, id}, or NULL for an all-NULL group. See
    * [[TopKPairThreshold]].
    */
  def topk_threshold(key: Column, id: Column, k: Int): Column =
    Shims.column(
      TopKPairThreshold(
        Shims.expression(key), Shims.expression(id), k).toAggregateExpression())

  /** Misra-Gries frequent-elements sketch: ≤ k surviving (key, est)
    * pairs, key-sorted; every key with frequency > n/(k+1) guaranteed
    * present. NULL keys ignored. See [[HeavyHitters]].
    */
  def heavy_hitters(key: Column, k: Int): Column =
    Shims.column(
      HeavyHitters(Shims.expression(key), k).toAggregateExpression())

  /** Count-Min counter matrix (depth = divisors.length rows × width,
    * flattened row-major) over non-negative BIGINT key hashes; probe
    * with [[CountMinBuild.estimate]]. NULL keys ignored. See
    * [[CountMinBuild]].
    */
  def cms_build(keyHash: Column, width: Int, divisors: Seq[Long]): Column =
    Shims.column(
      CountMinBuild(Shims.expression(keyHash), width, divisors)
        .toAggregateExpression())
}

object CountMinBuild {
  import org.apache.spark.sql.functions.{col, element_at, expr, least}

  /** The point-query estimate against a built matrix column: min over
    * rows of the key's cell (1-based `element_at` over the row-major
    * flattening). Takes COLUMN NAMES, not Columns: the bucket arithmetic
    * must be SQL `div` (integral), never Column `/` (IEEE double — a
    * 60-bit hash through a double loses low bits silently). Pure column
    * arithmetic — codegen'd, broadcast-friendly.
    */
  def estimate(matrixCol: String, keyHashCol: String, width: Int,
      divisors: Seq[Long]): Column = {
    val cells = divisors.zipWithIndex.map { case (p, d) =>
      element_at(col(matrixCol),
        expr(s"cast((($keyHashCol div ${p}L) % $width) as int)" +
          s" + ${d * width + 1}"))
    }
    if (cells.length == 1) cells.head else least(cells: _*)
  }
}
