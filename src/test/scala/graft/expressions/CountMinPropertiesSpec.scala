package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the Count-Min buffer algebra, exercised
  * directly through the aggregate's update/merge/serialize path (no Spark
  * session — the KernelPropertiesSpec discipline for aggregate state).
  */
class CountMinPropertiesSpec extends AnyFunSuite {

  private val W = 32
  private val Divs = Seq(1L, 7L, 49L)
  private def agg = CountMinBuild(
    BoundReference(0, LongType, nullable = true), W, Divs)

  private def check(label: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private def build(keys: Seq[Long]): Array[Long] =
    keys.foldLeft(agg.createAggregationBuffer()) { (b, k) =>
      agg.update(b, InternalRow(Long.box(k)))
    }

  /** The consumer's point query, mirrored in pure Scala. */
  private def est(buf: Array[Long], h: Long): Long =
    Divs.zipWithIndex.map { case (p, d) =>
      buf(d * W + ((h / p) % W).toInt)
    }.min

  private val keyGen: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val keysGen: Gen[List[Long]] = Gen.listOf(keyGen)

  test("estimates never undercount any key, probed or not") {
    check("never-under")(Prop.forAll(keysGen, keyGen) { (keys, probe) =>
      val buf = build(keys)
      val trueCount = keys.count(_ == probe).toLong
      est(buf, probe) >= trueCount &&
        keys.distinct.forall(k => est(buf, k) >= keys.count(_ == k).toLong)
    })
  }

  test("merge of any split equals the one-shot build (monoid)") {
    check("merge-split")(Prop.forAll(keysGen, Gen.chooseNum(0, 100)) {
      (keys, cut) =>
        val (a, b) = keys.splitAt(cut % (keys.length + 1))
        val merged = agg.merge(build(a), build(b))
        merged.toSeq == build(keys).toSeq
    })
  }

  test("serialize/deserialize round-trips the matrix exactly") {
    check("serde")(Prop.forAll(keysGen) { keys =>
      val buf = build(keys)
      agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq
    })
  }

  test("NULL keys leave the matrix untouched; total mass = rows x depth") {
    check("mass")(Prop.forAll(keysGen) { keys =>
      val withNulls = build(keys) // nulls exercised via direct update below
      val b2 = agg.update(withNulls, InternalRow(null))
      b2.sum == keys.length.toLong * Divs.length
    })
  }
}
