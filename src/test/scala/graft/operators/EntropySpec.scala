package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSuite

/** c14 quantized-entropy semantics: hand-computed whole-bit code lengths
  * on constructed distributions, the quantization's floor behavior, and
  * the NULL-accounting edges (c12's rules).
  */
class EntropySpec extends SparkSuite {

  private def rowOf(vals: Seq[Option[String]]): Row = {
    import spark.implicits._
    Profile.entropyOf(vals.toDF("v"), "t.c").collect().head
  }

  test("skewed 4:2:1:1 distribution: hand-computed whole-bit sum") {
    // n=8; bits = bitlength(n div c) − 1: a(4)→1, b(2)→2, c(1)→3, d(1)→3
    // sum = 4·1 + 2·2 + 1·3 + 1·3 = 14; mean = 14/8 = 1.75
    val r = rowOf(Seq("a", "a", "a", "a", "b", "b", "c", "d").map(Some(_)))
    assert((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)) ===
      ((8L, 4L, 14L, 1.75)))
  }

  test("uniform power-of-two classes quantize exactly to log2(k) bits") {
    // 4 classes × 2: every value costs exactly 2 bits, mean = 2.0
    val r = rowOf(Seq("a", "a", "b", "b", "c", "c", "d", "d").map(Some(_)))
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) === ((4L, 16L, 2.0)))
  }

  test("single class carries zero information; minorities always cost ≥ 1 bit") {
    val pure = rowOf(Seq(Some("a"), Some("a"), Some("a")))
    assert((pure.getLong(3), pure.getLong(4), pure.getDouble(5)) ===
      ((1L, 0L, 0.0)))
    // quantized entropy is 0 IFF one class: any minority has c ≤ n/2,
    // so n div c ≥ 2 contributes at least one bit
    val nearlyPure = rowOf(Seq.fill(9)(Some("a")) :+ Some("b"))
    assert(nearlyPure.getLong(4) > 0L)
  }

  test("NULLs are accounted but sit outside the distribution") {
    val r = rowOf(Seq(Some("a"), Some("a"), None, Some("b"), None))
    // n=3 (a:2, b:1): a → bitlength(1)−1 = 0, b → bitlength(3)−1 = 1
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((3L, 2L, 2L, 1L)))
  }

  test("all NULL: zero-filled, no division blowup") {
    val r = rowOf(Seq(None, None))
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5)) === ((0L, 2L, 0L, 0L, 0.0)))
  }

  test("random distributions: quantized mean brackets true entropy within 1 bit") {
    // per value, floor(log2(n/c)) ≤ log2(n/c) < floor + 1, so summing:
    // mean_q ≤ H_true < mean_q + 1 — the documented quantization contract
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(8)
      val counts = (0 until k).map(_ => 1 + rnd.nextInt(20))
      val vals = counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(Some(s"v$i"))
      }
      val n = counts.sum.toDouble
      val hTrue = counts.map(c => c / n * (math.log(n / c) / math.log(2.0))).sum
      val r = rowOf(vals)
      val meanQ = r.getLong(4).toDouble / r.getLong(1).toDouble
      assert(meanQ <= hTrue + 1e-9 && hTrue < meanQ + 1.0,
        s"trial $trial (counts=$counts): quantized $meanQ vs true $hTrue")
    }
  }

  test("fixture gate entry: same columns as c12, quantization bounds hold") {
    val rows = Profile.entropyProfile(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("documents.lang", "documents.source", "events.event_type"))
    rows.foreach { r =>
      val (n, nDistinct, sumBits, mean) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(n > 0L && nDistinct > 0L, s"${r.getString(0)}: empty column")
      // floor quantization never exceeds the true entropy ≤ log2(k)
      assert(mean <= math.log(nDistinct.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: mean $mean above log2($nDistinct)")
      assert(sumBits >= 0L && mean >= 0.0)
      // mean is exactly the rounded ratio of the exact integers
      assert(mean ===
        BigDecimal(sumBits.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
