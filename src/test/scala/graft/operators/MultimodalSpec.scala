package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

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

  /** A real w×h PNG with a constant (r,g,b) fill, encoded via the same JDK
    * ImageIO the kernel decodes with — a genuine codec round-trip.
    */
  private def pngBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real JPEG of the given size filled with one gray level, encoded
    * via the same JDK ImageIO the kernel decodes with.
    */
  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("m1 JPEG arm: real JPEGs decode through the dispatch; lossy, so " +
      "dimensions pin exactly and statistics pin within tolerance") {
    import spark.implicits._
    val jpg = jpegBytes(12, 9, 144)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
      "encoder must emit a real JPEG SOI marker")
    val corrupt = jpg.take(6) // valid magic, truncated body
    val media = Seq((1L, Option("s"), jpg), (2L, Option("s"), corrupt))
      .toDF("doc_id", "source", "media")
    val out = Multimodal.decodeFramesOf(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    // dimensions and pixel count are metadata — exact under lossy coding
    assert(out(1L).getInt(2) == 12 && out(1L).getInt(3) == 9 &&
      out(1L).getInt(4) == 108, s"JPEG metadata wrong: ${out(1L)}")
    // a uniform gray survives JPEG nearly exactly; pin a tight band, not
    // a hash (round-11 verdict item #8: lossy codec, no pixel hashes)
    val mean = out(1L).getDouble(5)
    assert(math.abs(mean - 144.0) <= 3.0, s"uniform-gray mean drifted: $mean")
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(5),
      "truncated JPEG must yield a NULL-metadata row, not a dead partition")
    // the m4 feature arm: histogram concentrates at the gray bin
    val feats = Multimodal.mediaFeaturesOf(media).collect()
    assert(feats.length == 1, "only the decodable JPEG yields features")
    // 144 sits mid-bin (bin 4 spans 128..159): a +/-1 lossy drift
    // cannot flip the bin, unlike a boundary value like 128
    val grayBin = 144 * Multimodal.FeatureBins / 256
    val mass = feats(0).getDouble(2 + grayBin)
    assert(mass > 0.99, s"uniform gray must concentrate its bin: $mass")
  }

  test("m1 real-codec arm: encoded PNGs decode through the partition-mapped pass") {
    import spark.implicits._
    // two real PNGs with known dimensions and exact constant luminance,
    // one corrupt blob (truncated PNG), one unknown format — all four
    // through ONE mapPartitions pass, no partition may die
    val good1 = pngBytes(8, 5, 30, 60, 90)   // lum = (30+60+90)/3 = 60
    val good2 = pngBytes(3, 7, 255, 255, 255) // lum = 255
    val corrupt = good1.take(20)             // valid magic, truncated body
    val unknown = Array[Byte]('X', 'Y', 1, 2, 3)
    val media = Seq(
      (1L, Option("s"), good1), (2L, Option("s"), good2),
      (3L, Option("s"), corrupt), (4L, Option("s"), unknown))
      .toDF("doc_id", "source", "media")
    val out = Multimodal.decodeFramesOf(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 8 && out(1L).getInt(3) == 5 &&
      out(1L).getInt(4) == 40 && out(1L).getDouble(5) == 60.0,
      s"8x5 constant-fill PNG decoded wrong: ${out(1L)}")
    assert(out(2L).getInt(2) == 3 && out(2L).getInt(3) == 7 &&
      out(2L).getDouble(5) == 255.0)
    // corrupt and unknown blobs surface as accounted NULL-metadata rows
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(5),
      "truncated PNG must yield a NULL-metadata row, not a dead partition")
    assert(out(4L).isNullAt(2), "unknown magic must be accounted, not thrown")
  }

  test("m4/m7 real-codec arm: same pixels under different bytes are perceptual dups") {
    import spark.implicits._
    // a gradient image; its byte-identical re-host with trailing garbage
    // after IEND decodes to the SAME pixels but a different byte stream —
    // m5's exact payload hash can never match them, the decoded-pixel
    // luminance histogram lands them at L1 = 0
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val lum = (y * 16 + x) * 255 / 255
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytesA = bos.toByteArray
    val bytesB = bytesA ++ Array[Byte](9, 9, 9)
    assert(!java.util.Arrays.equals(bytesA, bytesB))
    val media = Seq((1L, Option("s"), bytesA), (2L, Option("s"), bytesB))
      .toDF("doc_id", "source", "media")
    // identical luminance histograms from both encodings
    val feats = Multimodal.mediaFeaturesOf(media).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(feats(1L) === feats(2L),
      "same pixels must extract identical perceptual features")
    // the m7 mining pass over the real-codec features: one pair at L1 = 0
    val pairs = Multimodal.neardupPairsOf(Multimodal.microFeaturesOf(media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)),
      s"expected the re-encoded twin at L1=0, got ${pairs.toSeq}")
    // while the exact payload hash (m5) correctly sees two DIFFERENT blobs
    assert(Multimodal.mediaDedupOf(media).count() === 0L,
      "byte-different blobs must not collapse under the exact hash")
  }

  /** A real 16-bit PCM mono WAV with the given samples, encoded via the
    * same JDK AudioSystem the kernel decodes with.
    */
  private def wavBytes(samples: Array[Short], rateHz: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1,
      true, false) // PCM signed, little-endian, mono
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("m10 audit: every verdict class with first-fail priority on a hand corpus") {
    import spark.implicits._
    val aaa = "a" * 1000
    val nearA = "a" * 999 + "b" // histogram L1 = 2000 micro ≤ 20000: near 10
    val docs = Seq(
      (10L, Some(aaa)),     // keeper of the exact group {10, 11}
      (11L, Some(aaa)),     // byte-identical → drop_exact, keeper 10
      (12L, Some(nearA)),   // survivor, perceptually near 10 → drop_near
      (13L, Some("z" * 1000)), // far distribution → kept
      (14L, None: Option[String]), // NULL payload → no_payload
      (15L, Some(nearA)))   // exact copy of 12: drop_exact BEFORE near
      .toDF("doc_id", "text")
    val got = Multimodal.mediaAuditOf(Multimodal.mediaTableOf(docs))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(10L) === (("kept", -1L)))
    assert(got(11L) === (("drop_exact", 10L)))
    assert(got(12L) === (("drop_near", 10L)),
      "survivor near the keeper must attribute to the smallest partner")
    assert(got(13L) === (("kept", -1L)))
    assert(got(14L) === (("no_payload", -1L)))
    assert(got(15L) === (("drop_exact", 12L)),
      "first-fail: an exact dup is never evaluated perceptually")
  }

  test("m10 fixture consistency: kept ≡ surviving both ladder stages") {
    val audit = Multimodal.mediaAudit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.Catalog.documents(spark, sfDir).count()
    assert(audit.size.toLong === docs, "one verdict per document")
    // every m5 duplicate group: exactly its keeper survives the exact stage
    val m5 = Multimodal.mediaDedup(spark, sfDir).collect()
    m5.foreach { g =>
      val keeper = g.getLong(2)
      assert(audit(keeper) != "drop_exact",
        s"group keeper $keeper marked drop_exact")
    }
    val nExact = audit.values.count(_ == "drop_exact")
    val m5Dropped = m5.map(g => g.getLong(1) - 1).sum
    assert(nExact.toLong === m5Dropped,
      s"drop_exact count $nExact != m5's ${m5Dropped} non-keeper copies")
  }

  test("resize arm: real PNG re-rendered at target resolution round-trips") {
    import spark.implicits._
    // 16x16 gradient → 4x4 nearest-neighbor: deterministic pixel picks
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val lum = y * 16 + x
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, Option("s"), bos.toByteArray),
      (2L, Option("s"), Array[Byte]('X', 'X', 0)))
      .toDF("doc_id", "source", "media")
    val out = Multimodal.resizePngOf(media, 4, 4).collect()
    assert(out.length === 1, "non-PNG blob must drop from the resize pass")
    val r = out(0)
    assert(r.getInt(1) === 4 && r.getInt(2) === 4)
    // the emitted bytes are a real decodable PNG at the target size
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](3)))
    assert(back.getWidth === 4 && back.getHeight === 4)
    // determinism: the same input resizes to the same bytes
    val again = Multimodal.resizePngOf(media, 4, 4).collect()(0)
    assert(java.util.Arrays.equals(
      r.getAs[Array[Byte]](3), again.getAs[Array[Byte]](3)))
  }

  test("frame-sample arm: animated GIF frames sample through the reader") {
    import spark.implicits._
    // a real 10-frame animated GIF via the JDK's sequence writer
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 10) {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6)
        img.setRGB(x, y, (f * 25) << 16)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val media = Seq((1L, Option("s"), bos.toByteArray),
      (2L, Option("s"), Array[Byte]('G', 'R', 0)))
      .toDF("doc_id", "source", "media")
    val out = Multimodal.gifFrameSampleOf(media, every = 4)
      .collect().map(r => (r.getInt(2), r.getInt(1), r.getInt(3), r.getInt(4)))
    // frames 0, 4, 8 of 10; every sampled frame reports the true dims
    assert(out.map(_._1).sorted.toSeq === Seq(0, 4, 8), s"got ${out.toSeq}")
    assert(out.forall { case (_, n, w, h) => n == 10 && w == 6 && h == 4 })
  }

  test("audio arm: real WAV decodes through the partition-mapped pass") {
    import spark.implicits._
    // known samples: |100| + |-200| + |300| + |0| → mean abs = 150.0
    val good = wavBytes(Array[Short](100, -200, 300, 0), 8000)
    val notAudio = Array[Byte]('X', 'X', 1, 2)
    val media = Seq((1L, Option("s"), good), (2L, Option("s"), notAudio))
      .toDF("doc_id", "source", "media")
    val out = Multimodal.audioMetaOf(media).collect()
    assert(out.length === 1, "non-audio blob must drop, not throw")
    val r = out(0)
    assert(r.getLong(0) === 1L && r.getInt(1) === 1 &&
      r.getInt(2) === 8000 && r.getInt(3) === 16 && r.getLong(4) === 4L,
      s"WAV metadata wrong: $r")
    assert(r.getDouble(5) === 150.0, s"mean abs amplitude: ${r.getDouble(5)}")
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

  test("m5 seeded gate is NON-VACUOUS: rehosted copies collapse, originals keep") {
    // round-11 verdict item #2: the pure-fixture gate passed 0 = 0 rows;
    // the registered gate now seeds rehosted copies and must prove the
    // collapse rule with actual groups
    val groups = Multimodal.mediaDedupSeeded(spark, sfDir).collect()
    assert(groups.nonEmpty, "seeded m5 gate must be non-vacuous")
    val eligible = graft.Catalog.documents(spark, sfDir)
      .filter(col("doc_id") % Multimodal.RehostMod === Multimodal.RehostRem &&
        col("text").isNotNull && org.apache.spark.sql.functions
          .length(col("text")) > 0)
      .count()
    assert(eligible > 0, "fixture must contain rehost-eligible docs")
    groups.foreach { g =>
      assert(g.getLong(1) >= 2L, "only multi-copy groups emit")
      assert(g.getLong(2) < Multimodal.RehostIdOffset,
        s"keeper must be an ORIGINAL id (min-id election): ${g.getLong(2)}")
    }
    // every eligible doc's payload gained a copy → total duplicate mass
    // is at least the eligible count (natural fixture dups only add)
    val extraCopies = groups.map(g => g.getLong(1) - 1).sum
    assert(extraCopies >= eligible,
      s"expected ≥ $eligible rehosted duplicates, saw $extraCopies")
  }

  test("m8 denylist flags REHOSTED copies of a listed payload, not just listed ids") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("bad content")),    // listed
      (2L, Some("bad content")),    // rehosted copy — must flag
      (3L, Some("fine content")),   // clean
      (4L, None),                   // NULL media — never flags
      (5L, Some("")))               // header-only — never flags
      .toDF("doc_id", "text")
    val media = Multimodal.mediaTableOf(docs)
    val deny = Multimodal.mediaDedupOf(media)   // derive the listed fp
      .select(col("payload_fp"))                // (1/2's shared payload)
    val flagged = Multimodal.mediaDenylistOf(media, deny)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 2L),
      s"denylist must catch both the listed id AND its copy: $flagged")
  }

  test("m8 gate: seeds are flagged and every flagged row shares a seed payload") {
    val got = Multimodal.mediaDenylist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.nonEmpty, "no denylist hits — vacuous")
    assert(got.exists(_._2), "no seed rows flagged")
    // every seed with payload must self-flag
    got.filter(_._2).foreach { case (id, _) =>
      assert(id % Multimodal.DenySeedMod === Multimodal.DenySeedRem)
    }
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

  // --- m6 content-defined chunking ---------------------------------------

  private def mediaOf(texts: (Long, String)*) = {
    import spark.implicits._
    Multimodal.mediaTableOf(texts.toSeq.toDF("doc_id", "text"))
  }

  private def chunksOf(texts: (Long, String)*): Map[Long, Seq[(Long, Long)]] =
    Multimodal.cdcChunksOf(mediaOf(texts: _*)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  test("m6 chunk lengths tile the payload exactly; short payloads = 1 chunk") {
    val base = ("x" * 500) + ("the quick brown fox " * 40)
    val got = chunksOf(1L -> base, 2L -> "tiny")
    assert(got(1L).map(_._1).sum == base.getBytes("UTF-8").length.toLong)
    // payloads shorter than the window can have no interior boundary
    assert(got(2L) == Seq((4L, got(2L).head._2)))
  }

  test("m6 shift-invariance: a front insertion re-syncs; fixed-size would not") {
    // same long tail, different-length prefixes -> after the CDC window
    // re-syncs inside the tail, chunking must realign and the docs share
    // their tail chunks (the entire reason CDC exists). The tail must be
    // content-VARIED: a repeating phrase has only |phrase| distinct
    // windows, which can statistically miss the 1/64 boundary condition
    // entirely
    val tail = (1 to 600).map(i => s"token$i word${i * 7 % 97}").mkString(" ")
    val got = chunksOf(10L -> ("AAA" + tail), 11L -> ("BBBBBBBBBB" + tail))
    val keys10 = got(10L).map(_._2).toSet
    val keys11 = got(11L).map(_._2).toSet
    val shared = keys10.intersect(keys11)
    assert(shared.nonEmpty,
      s"no shared chunks after a prefix edit: ${got(10L).size}/${got(11L).size} chunks")
    // the overwhelming majority of the tail's chunk mass re-aligns
    assert(shared.size * 2 >= keys10.size,
      s"only ${shared.size} of ${keys10.size} chunks re-aligned")
  }

  test("m7 banded candidates are lossless vs in-spec brute force; self-pair L1=0") {
    import spark.implicits._
    // deterministic varied corpus: far pairs (independent residue mixes)
    // plus engineered near pairs (same base, tiny suffix perturbation)
    // 70% of chars sit in the seed's residue class mod 8, 30% cycle
    // uniformly — different residue classes are FAR in L1 (~1.4 mass),
    // equal classes are near/identical
    def text(seed: Int): String =
      (0 until 400).map(i =>
        if (i % 10 < 7) (96 + seed % 8).toChar
        else ((seed * 31 + i * 17) % 64 + 48).toChar).mkString
    val docs = (1L to 12L).map(d => d -> text(d.toInt)) ++
      Seq(101L -> text(3), // byte-identical twin of doc 3 -> l1 = 0
        102L -> (text(5) + "zz")) // near twin of doc 5
    val media = mediaOf(docs: _*)
    val got = Multimodal.mediaNeardupOf(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same m4 features, same micro-unit arithmetic
    val feats = Multimodal.mediaFeaturesOf(media).collect()
      .map(r => r.getLong(0) ->
        (2 until 2 + Multimodal.FeatureBins).map(i =>
          math.round(r.getDouble(i) * 1e6)))
    val brute = (for {
      (da, ma) <- feats; (db, mb) <- feats if da < db
      l1 = ma.zip(mb).map { case (x, y) => math.abs(x - y) }.sum
      if l1 <= Multimodal.NeardupL1Micro
    } yield (da, db, l1)).toSet
    assert(got == brute, s"banded != brute: ${got.diff(brute)} / ${brute.diff(got)}")
    assert(got.contains((3L, 101L, 0L)), "byte-identical twin must pair at L1=0")
    assert(got.exists { case (a, b, l) => a == 5L && b == 102L && l > 0L },
      "perturbed twin must pair at small nonzero L1")
    assert(brute.size < feats.length * (feats.length - 1) / 2,
      "fixture must also contain far pairs or the test proves nothing")
  }

  test("m7/m9 losslessness is parameter-robust: a threshold sweep matches " +
    "brute force at every T") {
    import spark.implicits._
    def text(seed: Int): String =
      (0 until 400).map(i =>
        if (i % 10 < 7) (96 + seed % 8).toChar
        else ((seed * 31 + i * 17) % 64 + 48).toChar).mkString
    val docs = (1L to 12L).map(d => d -> text(d.toInt)) ++
      Seq(101L -> text(3), 102L -> (text(5) + "zz"))
    val media = mediaOf(docs: _*)
    val micro = Multimodal.microFeaturesOf(media)
    val feats = Multimodal.mediaFeaturesOf(media).collect()
      .map(r => r.getLong(0) ->
        (2 until 2 + Multimodal.FeatureBins).map(i =>
          math.round(r.getDouble(i) * 1e6)))
    val pairCount = scala.collection.mutable.ListBuffer.empty[Int]
    // spans tighter AND looser than both registered thresholds, plus a
    // width-1-cell degenerate (T < #bands) exercising the floor clamp
    Seq(3L, 5000L, Multimodal.NeardupL1Micro, Multimodal.NeardupL1MicroWide,
      200000L).foreach { t =>
      val got = Multimodal.neardupPairsOf(micro, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (da, ma) <- feats; (db, mb) <- feats if da < db
        l1 = ma.zip(mb).map { case (x, y) => math.abs(x - y) }.sum
        if l1 <= t
      } yield (da, db, l1)).toSet
      assert(got == brute,
        s"T=$t: banded != brute: ${got.diff(brute)} / ${brute.diff(got)}")
      pairCount += brute.size
    }
    assert(pairCount.distinct.size > 1,
      "the sweep must actually change the pair set or it proves one point")
  }

  test("m6 dedup accounting: identical payloads share every chunk, cross-doc only") {
    import spark.implicits._
    val text = ("shared payload body " * 50)
    val rows = Multimodal.cdcDedupOf(mediaOf(1L -> text, 2L -> text, 3L -> "solo unlike anything"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val bytes = text.getBytes("UTF-8").length.toLong
    Seq(1L, 2L).foreach { d =>
      val (n, dup, db) = rows(d)
      assert(n > 0 && dup == n && db == bytes,
        s"doc $d: all $n chunks must be shared, got $dup / $db bytes")
    }
    val (n3, dup3, db3) = rows(3L)
    assert(n3 >= 1 && dup3 == 0L && db3 == 0L, "unique payload has no dup mass")
  }
}
