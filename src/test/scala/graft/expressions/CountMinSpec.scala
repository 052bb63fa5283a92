package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** CountMinBuild semantics: never-under, exactness without collisions,
  * partition-merge invariance, NULL handling — the invariants the a12 gate
  * rides (the gate itself hash-compares estimates against the DuckDB
  * collision-sum recomputation).
  */
class CountMinSpec extends SparkSuite {

  private val W = 16
  private val Divs = Seq(1L, 7L, 49L, 343L)

  private def sketchOf(keys: Seq[java.lang.Long], parts: Int = 1) = {
    import spark.implicits._
    keys.toDF("h").repartition(parts)
      .agg(SketchFunctions.cms_build(col("h"), W, Divs).as("cms"))
  }

  private def estimates(keys: Seq[java.lang.Long], probes: Seq[Long],
      parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    probes.toDF("h")
      .crossJoin(broadcast(sketchOf(keys, parts)))
      .select(col("h"),
        CountMinBuild.estimate("cms", "h", W, Divs).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("no collisions: estimates are exact counts") {
    // keys 0..9 with multiplicity = key+1; W=16 > 10 keys and divisor row 0
    // is identity % 16, so row 0 alone is collision-free for keys < 16
    val keys = (0L to 9L).flatMap(k => Seq.fill(k.toInt + 1)(Long.box(k)))
    val got = estimates(keys, 0L to 9L)
    (0L to 9L).foreach(k => assert(got(k) == k + 1, s"key $k: $got"))
  }

  test("estimates never undercount, even under forced collisions") {
    // every key congruent mod W collides in row 0; deeper rows separate
    val keys = Seq(1L, 17L, 33L, 1L, 1L).map(Long.box)
    val got = estimates(keys, Seq(1L, 17L, 33L))
    assert(got(1L) >= 3L && got(17L) >= 1L && got(33L) >= 1L, s"got $got")
    // the min over rows beats the worst row: with divisors 7/49/343 these
    // keys land apart beyond row 0, so the estimate is exact here
    assert(got(1L) == 3L && got(17L) == 1L && got(33L) == 1L, s"got $got")
  }

  test("merge across partitions is invariant") {
    val keys = (0L until 200L).map(k => Long.box(k % 23))
    val one = estimates(keys, 0L until 23L, parts = 1)
    val many = estimates(keys, 0L until 23L, parts = 8)
    assert(one == many)
  }

  test("NULL keys are ignored; an empty input yields an all-zero matrix") {
    val got = estimates(Seq(null, null, Long.box(5L)), Seq(5L, 6L))
    assert(got(5L) == 1L)
    assert(got(6L) == 0L) // 6 shares no cell mass with 5 at W=16
  }
}
