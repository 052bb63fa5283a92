package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the deployment sizing formulas — the pure
  * functions that turn persisted statistics into physical-plan knobs
  * (salt fan-out, pack shard count). A wrong clamp or a non-monotone
  * edge here silently mis-sizes a 100 TB job, so the algebra is pinned
  * the same way the hash kernels are.
  */
class SizingPropertiesSpec extends AnyFunSuite {

  private def check(label: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val anyLong: Gen[Long] = Gen.chooseNum(-10L, Long.MaxValue)
  private val posLong: Gen[Long] = Gen.chooseNum(1L, Long.MaxValue)

  test("saltsFor stays within [1, 1024] for every input, including degenerate ones") {
    check("saltsFor-bounds")(Prop.forAll(anyLong, anyLong) { (hot, budget) =>
      val r = Relational.saltsFor(hot, budget)
      r >= 1 && r <= 1024
    })
  }

  test("saltsFor is monotone in hot-key mass and antitone in the task budget") {
    check("saltsFor-monotone")(Prop.forAll(posLong, posLong, posLong) {
      (a, b, budget) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        Relational.saltsFor(lo, budget) <= Relational.saltsFor(hi, budget)
    })
    check("saltsFor-antitone")(Prop.forAll(posLong, posLong, posLong) {
      (hot, a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        Relational.saltsFor(hot, hi) <= Relational.saltsFor(hot, lo)
    })
  }

  test("saltsFor is exact ceil-division in the practical range") {
    // the clamp-free interior: R covers the hot key in budget-sized
    // slices with no slack slice
    val hotGen = Gen.chooseNum(1L, 1L << 40)
    val budgetGen = Gen.chooseNum(1L, 1L << 30)
    check("saltsFor-ceil")(Prop.forAll(hotGen, budgetGen) { (hot, budget) =>
      val exact = (hot + budget - 1) / budget
      exact > 1024 || Relational.saltsFor(hot, budget) == exact.toInt
    })
  }

  test("shardBucketsFor stays within [ShardBuckets, 2^20] and is monotone in both inputs") {
    val tokens: Gen[Long] = Gen.chooseNum(-10L, Long.MaxValue)
    val par: Gen[Int] = Gen.chooseNum(-4, 1 << 20)
    check("shardBucketsFor-bounds")(Prop.forAll(tokens, par) { (t, p) =>
      val r = TextOps.shardBucketsFor(t, p)
      r >= TextOps.ShardBuckets && r <= (1 << 20)
    })
    check("shardBucketsFor-monotone-tokens")(Prop.forAll(tokens, tokens, par) {
      (a, b, p) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        TextOps.shardBucketsFor(lo, p) <= TextOps.shardBucketsFor(hi, p)
    })
    check("shardBucketsFor-monotone-parallelism")(Prop.forAll(tokens, par, par) {
      (t, a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        TextOps.shardBucketsFor(t, lo) <= TextOps.shardBucketsFor(t, hi)
    })
  }
}
