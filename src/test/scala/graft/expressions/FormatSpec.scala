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
