package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure JVM kernels behind the custom
  * Catalyst expressions (SURVEY.md §5 "property-based" commitment). These
  * run without a Spark session — they pin the algebra the distributed
  * operators rely on.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(label: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private def arr(xs: Seq[Long]): ArrayData = ArrayData.toArrayData(xs.toArray)
  private def longs(a: ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)

  private val hashGen: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val hashSetGen: Gen[Seq[Long]] = Gen.listOf(hashGen).map(_.distinct)

  test("md5Prefix60 stays within 60 bits and is deterministic") {
    check("md5Prefix60")(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = Hash.md5Prefix60(s)
      h >= 0 && h < (1L << 60) && h == Hash.md5Prefix60(s)
    })
  }

  test("minhash signature of a union is the element-wise min (defining property)") {
    val a = graft.operators.Dedup.MinhashA
    val b = graft.operators.Dedup.MinhashB
    val p = graft.operators.Dedup.MinhashP
    check("minhash-union")(Prop.forAll(hashSetGen, hashSetGen) { (xs, ys) =>
      val sigU = longs(Hash.minhashSig(arr((xs ++ ys).distinct), a.toArray, b.toArray, p))
      val sigX = longs(Hash.minhashSig(arr(xs), a.toArray, b.toArray, p))
      val sigY = longs(Hash.minhashSig(arr(ys), a.toArray, b.toArray, p))
      sigU == sigX.zip(sigY).map { case (x, y) => math.min(x, y) }
    })
  }

  test("simhash60 is order-insensitive and within 60 bits") {
    check("simhash-perm")(Prop.forAll(hashSetGen) { xs =>
      val h1 = Hash.simhash60(arr(xs))
      val h2 = Hash.simhash60(arr(scala.util.Random.shuffle(xs)))
      h1 == h2 && h1 >= 0 && h1 < (1L << 60)
    })
  }

  test("shingleHash60 emits at most tokens-k+1 distinct hashes") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check("shingle-count")(Prop.forAll(Gen.listOf(wordGen), Gen.choose(2, 5)) {
      (words, k) =>
        val hs = longs(Hash.shingleHash60(
          UTF8String.fromString(words.mkString(" ")), k))
        hs.size == hs.distinct.size &&
          hs.size <= math.max(0, words.size - k + 1)
    })
  }

  test("winnow: any shared substring of >= w+k-1 bytes yields a shared fingerprint") {
    val k = 6; val w = 4
    val chunk = Gen.listOfN(20, Gen.alphaNumChar).map(_.mkString)
    check("winnow-guarantee")(Prop.forAll(chunk, chunk, chunk) { (pre, common, post) =>
      // common is 20 bytes >= w + k - 1 = 9
      def fps(s: String) =
        longs(Hash.winnow(UTF8String.fromString(s), k, w)).toSet
      (fps(pre + common) & fps(common + post)).nonEmpty
    })
  }

  test("qualityStats counters partition the document") {
    check("quality-partition")(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val r = Hash.qualityStats(UTF8String.fromString(s),
        Array("the", "a", "of"))
      val nTok = r.getInt(0); val stop = r.getInt(1)
      val punct = r.getInt(2); val nChars = r.getInt(3)
      nTok >= 1 && stop >= 0 && stop <= nTok &&
        punct >= 0 && punct <= nChars && nChars == s.codePointCount(0, s.length)
    })
  }

  test("TopKPairThreshold heap: threshold equals the sort-based k-th smallest") {
    val pairGen = Gen.listOf(Gen.zip(hashGen, Gen.chooseNum(0L, 1L << 40)))
      .map(_.distinct) // the operator's contract: (key, id) pairs are unique
    val kGen = Gen.chooseNum(1, 8)
    check("topk-threshold")(Prop.forAll(pairGen, kGen) { (pairs, k) =>
      val h = new TopKPairThreshold.Heap(k)
      pairs.foreach { case (a, b) => h.offer(a, b) }
      val expect = pairs.sorted.take(k).lastOption
      val got = Option(h.pq.peek()).map(p => (p(0), p(1)))
      got == expect
    })
  }

  test("TopKPairThreshold heap: merging split halves equals offering all") {
    val pairGen = Gen.listOf(Gen.zip(hashGen, Gen.chooseNum(0L, 1L << 40)))
      .map(_.distinct)
    check("topk-merge")(Prop.forAll(pairGen, Gen.chooseNum(1, 6),
      Gen.chooseNum(0, 100)) { (pairs, k, cut) =>
      val (xs, ys) = pairs.splitAt(cut % (pairs.size + 1))
      val whole = new TopKPairThreshold.Heap(k)
      pairs.foreach { case (a, b) => whole.offer(a, b) }
      val left = new TopKPairThreshold.Heap(k)
      xs.foreach { case (a, b) => left.offer(a, b) }
      val right = new TopKPairThreshold.Heap(k)
      ys.foreach { case (a, b) => right.offer(a, b) }
      val it = right.pq.iterator()
      while (it.hasNext) { val p = it.next(); left.offer(p(0), p(1)) }
      Option(left.pq.peek()).map(p => (p(0), p(1))) ==
        Option(whole.pq.peek()).map(p => (p(0), p(1)))
    })
  }

  test("blockNorms: profile cosine upper-bounds vector cosine") {
    val vecGen = Gen.listOfN(32, Gen.chooseNum(-10.0f, 10.0f))
    check("blocknorm-bound")(Prop.forAll(vecGen, vecGen) { (xs, ys) =>
      def fArr(v: Seq[Float]) = ArrayData.toArrayData(v.toArray)
      val cos = VecKernels.cosineFF(fArr(xs), fArr(ys))
      val bound = VecKernels.cosineFF(
        VecKernels.blockNorms(fArr(xs), 8), VecKernels.blockNorms(fArr(ys), 8))
      bound + 1e-6 >= cos
    })
  }
}
