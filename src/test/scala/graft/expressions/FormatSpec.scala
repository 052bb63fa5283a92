package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the formatting kernels behind the custom
  * Catalyst expressions (SURVEY.md §4 items 1-2).
  */
class FormatSpec extends AnyFunSuite {

  test("sizePretty unit ladder") {
    assert(Fmt.sizePretty(0L).toString == "0 B")
    assert(Fmt.sizePretty(1023L).toString == "1023 B")
    assert(Fmt.sizePretty(1024L).toString == "1.0 KB")
    assert(Fmt.sizePretty(1536L).toString == "1.5 KB")
    assert(Fmt.sizePretty(1048576L).toString == "1.0 MB")
    assert(Fmt.sizePretty(5L * 1024 * 1024 * 1024).toString == "5.0 GB")
    assert(Fmt.sizePretty(-2048L).toString == "-2.0 KB")
  }

  test("formatDuration H:MM:SS") {
    assert(Fmt.formatDuration(0L).toString == "0:00:00")
    assert(Fmt.formatDuration(59L).toString == "0:00:59")
    assert(Fmt.formatDuration(61L).toString == "0:01:01")
    assert(Fmt.formatDuration(3661L).toString == "1:01:01")
    assert(Fmt.formatDuration(90000L).toString == "25:00:00")
    assert(Fmt.formatDuration(-61L).toString == "-0:01:01")
  }

  test("sizePretty shape holds across magnitudes (property)") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val n = math.abs(rnd.nextLong() % (Long.MaxValue / 2))
      val s = Fmt.sizePretty(n).toString
      assert(s.matches("""\d+ B|\d+\.\d [KMGTPE]B"""), s"bad format: $s for $n")
    }
  }

  test("winnow: shared long substring guarantees a shared fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val k = 8; val w = 16
    val common = "the quick brown fox jumps over the lazy dog repeatedly"
    val a = UTF8String.fromString("PREFIX-A " + common + " SUFFIX-A")
    val b = UTF8String.fromString("completely different start " + common + " other end")
    def set(u: UTF8String) = {
      val arr = Hash.winnow(u, k, w)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val shared = set(a) & set(b)
    assert(shared.nonEmpty, "no shared fingerprint despite 50+ byte overlap")
    // unrelated strings share nothing
    val c = UTF8String.fromString("zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp")
    assert((set(a) & set(c)).isEmpty)
  }

  test("winnow: deterministic, short-input and edge behavior") {
    import org.apache.spark.unsafe.types.UTF8String
    val t = UTF8String.fromString("abcdefghij")
    val one = Hash.winnow(t, 8, 16)
    val two = Hash.winnow(t, 8, 16)
    assert((0 until one.numElements()).map(one.getLong) ==
      (0 until two.numElements()).map(two.getLong))
    assert(one.numElements() == 1, "fewer grams than window → single min")
    assert(Hash.winnow(UTF8String.fromString("ab"), 8, 16).numElements() == 0)
  }

  test("winnow deque equals a naive window-min reference (property)") {
    import org.apache.spark.unsafe.types.UTF8String
    // the monotonic-deque sliding minimum must emit exactly the minima the
    // O(n·w) definition does, on random small-alphabet strings (small
    // alphabets maximize duplicate hash values — the deque's tie edge)
    val rnd = new scala.util.Random(7)
    def naive(text: String, k: Int, w: Int): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      if (n < k) return Seq.empty
      val Mod = (1L << 61) - 1
      val Base = 257L
      def mulMod(a: BigInt, b: BigInt): Long = ((a * b) % Mod).toLong
      val nGrams = n - k + 1
      val hashes = new Array[Long](nGrams)
      (0 until nGrams).foreach { i =>
        var h = BigInt(0)
        (i until i + k).foreach(j => h = (h * Base + (bytes(j) & 0xff)) % Mod)
        hashes(i) = h.toLong
      }
      if (nGrams <= w) Seq(hashes.min)
      else {
        val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
        (0 to nGrams - w).foreach(i => seen += hashes.slice(i, i + w).min)
        seen.toSeq
      }
    }
    (0 until 200).foreach { _ =>
      val len = rnd.nextInt(120)
      val text = Seq.fill(len)("abc".charAt(rnd.nextInt(3))).mkString
      val k = 2 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(10)
      val got = {
        val arr = Hash.winnow(UTF8String.fromString(text), k, w)
        (0 until arr.numElements()).map(arr.getLong)
      }
      assert(got == naive(text, k, w),
        s"mismatch for len=$len k=$k w=$w text='$text'")
    }
  }

  test("formatDuration round-trips seconds (property)") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val n = math.abs(rnd.nextLong() % 10000000L)
      val s = Fmt.formatDuration(n).toString
      val Array(h, m, sec) = s.split(":")
      assert(h.toLong * 3600 + m.toLong * 60 + sec.toLong == n, s"$s != $n")
    }
  }
}
