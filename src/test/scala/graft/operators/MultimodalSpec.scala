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

  test("m5 dedup: byte-identical payloads collapse across different headers; NULLs excluded") {
    import spark.implicits._
    // docs 1/8/3 share an identical payload under DIFFERENT doc_ids (so
    // different synthetic headers — whole-blob hashing would never match
    // them); 4 is unique; 5 is NULL text (no payload, not a duplicate);
    // 6/7 share a non-ASCII payload (byte-level, not codepoint-level, eq)
    val docs = Seq(
      (1L, Some("same payload")), (8L, Some("same payload")),
      (3L, Some("same payload")), (4L, Some("unique")),
      (5L, None), (6L, Some("héllo ✓")), (7L, Some("héllo ✓")),
      (9L, Some("")), (10L, Some("")))
      .toDF("doc_id", "text")
    val got = Multimodal.mediaDedupOf(Multimodal.mediaTableOf(docs))
      .collect().map(r => r.getLong(2) -> ((r.getLong(1), r.getLong(0))))
      .toMap // keeper -> (n_copies, fp)
    // 9/10 are header-only blobs (empty payload): non-content like
    // m3/m4's exclusion, NOT a duplicate pair
    assert(got.keySet == Set(1L, 6L), s"got $got")
    assert(got(1L)._1 == 3L && got(6L)._1 == 2L)
    assert(got(1L)._2 != got(6L)._2, "distinct payloads must not collide")
  }

  test("m4 features: normalized histogram (sums to ~1), UTF-8 bytes, empty excluded") {
    import spark.implicits._
    val docs = Seq((1L, "héllo ünïcode ✓"), (2L, "abc"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = Multimodal.mediaFeaturesOf(Multimodal.mediaTableOf(docs))
      .orderBy("doc_id").collect()
    // empty-payload doc 3 excluded (no histogram exists)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    rows.foreach { r =>
      val fs = (0 until Multimodal.FeatureBins).map(d => r.getDouble(2 + d))
      assert(fs.forall(f => f >= 0.0 && f <= 1.0))
      // per-bin 6-dp rounding bounds the sum's drift from 1
      assert(math.abs(fs.sum - 1.0) < 1e-5, s"histogram sum ${fs.sum}")
    }
    // "abc" = bytes 97,98,99 -> residues 1,2,3 mod 8, one third each
    val abc = rows(1)
    assert(abc.getInt(1) == 3)
    assert((0 until 8).map(d => abc.getDouble(2 + d)) ==
      Seq(0.0, 0.333333, 0.333333, 0.333333, 0.0, 0.0, 0.0, 0.0))
  }
}
