package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.VectorFunctions.{cosine_sim, dot_product}

/** n10 MIPS semantics: inner-product ranking is not cosine ranking, the
  * norm-augmentation reduction makes them coincide, and the augmented
  * view keeps every item at norm M (the property the reduction rests on).
  */
class MipsSpec extends SparkSuite {

  import spark.implicits._

  private val q = Seq(1.0f, 0.0f)

  // candidates: short-and-aligned vs long-and-diagonal. cosine prefers
  // 10 (cos 1.0 vs 0.707); the inner product prefers 11 (dot 5 vs 1).
  private val items = Seq(
    (10L, Seq(1.0f, 0.0f)),
    (11L, Seq(5.0f, 5.0f)),
    (12L, Seq(0.0f, 2.0f)))

  test("MIPS ranks by dot product, not by angle") {
    val df = items.toDF("vec_id", "embedding")
    val qv = typedLit(q)
    val got = df
      .select(col("vec_id"), dot_product(qv, col("embedding")).as("dot"),
        cosine_sim(qv, col("embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(-_._2).map(_._1)
    assert(got.toSeq == Seq(11L, 10L, 12L),
      "dot order must put the long diagonal vector first")
  }

  test("norm-augmented cosine order equals inner-product order per query") {
    val df = items.toDF("vec_id", "embedding")
    // M = max item norm = |(5,5)| = sqrt(50)
    val m = math.sqrt(50.0)
    val aug = Similarity.mipsAugment(df, m)
    // augmented query = [q, 0]
    val qAug = typedLit(q :+ 0.0f)
    val byCos = aug
      .select(col("vec_id"), cosine_sim(qAug, col("embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(-_._2).map(_._1).toSeq
    assert(byCos == Seq(11L, 10L, 12L),
      s"augmented-cosine order diverged from dot order: $byCos")
  }

  test("mipsAugment keeps every item at norm M and never NaNs at the max") {
    val df = items.toDF("vec_id", "embedding")
    val m = math.sqrt(50.0)
    val aug = Similarity.mipsAugment(df, m)
    val norms = aug
      .select(sqrt(dot_product(col("embedding"), col("embedding"))))
      .collect().map(_.getDouble(0))
    norms.foreach(n =>
      assert(math.abs(n - m) < 1e-3, s"augmented norm $n != M $m"))
    // the max-norm item's augment component must clamp to 0, not NaN,
    // even when float rounding drives M² − ‖x‖² slightly negative
    val last = aug.filter(col("vec_id") === 11L)
      .select(element_at(col("embedding"), 3)).collect().head.getFloat(0)
    assert(!last.isNaN && last >= 0.0f && last < 1e-2f)
  }

  test("n10 gate query: per-query dense ranks, dot descending, fixture-bound") {
    val got = Similarity.mipsTopK(spark, sfDir).collect()
    assert(got.nonEmpty)
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet.size.toLong <= Similarity.NQueries)
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rows.length).toSeq, "ranks must be dense 1..k")
      val dots = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(dots == dots.sorted.reverse, "dot must be non-increasing in rank")
    }
  }
}
