package graft.operators

import graft.SparkSuite

/** Decode-kernel invariants beyond the oracle gate — in particular the
  * UTF-8 byte accounting on non-ASCII payloads (round-4 verdict item #9:
  * the old oracle summed codepoints and only held on ASCII fixtures).
  */
class MultimodalSpec extends SparkSuite {

  test("m1 decode kernel sums UTF-8 BYTES on non-ASCII payloads") {
    import spark.implicits._
    val text = "héllo ünïcode ✓ 北京 — mañana"
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val out = Multimodal.decodeFramesOf(Multimodal.mediaTableOf(docs))
      .collect()(0)
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    assert(bytes.length > text.length, "fixture must be genuinely non-ASCII")
    assert(out.getInt(4) == bytes.length, "payload_bytes = UTF-8 byte count")
    val mean = BigDecimal(bytes.map(_.toLong).sum)
      ./(BigDecimal(bytes.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(5) == mean, s"${out.getDouble(5)} != $mean")
    assert(out.getInt(2) == (5 % 64 + 16) && out.getInt(3) == (5 % 48 + 16))
  }

  test("m1 decode yields null mean on an empty payload") {
    import spark.implicits._
    val docs = Seq((7L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeFramesOf(Multimodal.mediaTableOf(docs))
      .collect()(0)
    assert(out.getInt(4) == 0 && out.isNullAt(5))
  }
}
