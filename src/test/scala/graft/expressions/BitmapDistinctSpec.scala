package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.SketchFunctions.bitmap_distinct

/** BitmapDistinct: the fixed-state distinct sketch equals
  * count(DISTINCT floorMod(v, m)) exactly, across partial/merge paths,
  * NULLs, negative inputs, and bucket saturation.
  */
class BitmapDistinctSpec extends SparkSuite {

  test("occupancy equals count(DISTINCT bucket) across partitions and groups") {
    import spark.implicits._
    // 7 partitions forces partial buffers + serialize/merge on every group
    val df = (0L until 5000L).map(i => (s"g${i % 3}", i * 37 % 1000))
      .toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(bitmap_distinct(col("v"), 4096).as("sketch"),
        countDistinct(pmod(col("v"), lit(4096))).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"group ${r.getString(0)}"))
  }

  test("NULLs are ignored and negative values bucket via floorMod") {
    import spark.implicits._
    val df = Seq(Some(-1L), Some(-1L), Some(63L), None, Some(-65L))
      .toDF("v").repartition(3)
    // floorMod(-1, 64) = 63 = floorMod(63, 64); floorMod(-65, 64) = 63 too
    val n = df.agg(bitmap_distinct(col("v"), 64)).collect()(0).getLong(0)
    assert(n == 1L)
    // all-NULL input: empty bitmap, 0 (count(DISTINCT) semantics)
    val empty = Seq[Option[Long]](None, None).toDF("v")
      .agg(bitmap_distinct(col("v"), 64)).collect()(0).getLong(0)
    assert(empty == 0L)
  }

  test("occupancy saturates at numBits when cardinality exceeds the bitmap") {
    import spark.implicits._
    val n = (0L until 1000L).toDF("v").repartition(5)
      .agg(bitmap_distinct(col("v"), 64)).collect()(0).getLong(0)
    assert(n == 64L)
  }

  test("the aggregate plans object-hash with map-side partials (no expand/distinct shuffle)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i % 2, i)).toDF("g", "v").repartition(4)
    // the AQE wrapper hides the inner plan from collect(); assert on the
    // rendered tree instead
    val plan = df.groupBy("g").agg(bitmap_distinct(col("v"), 4096))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bitmap_distinct"),
      s"expected a map-side partial sketch:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(!plan.contains("Expand"),
      "sketch must not plan count-distinct's Expand")
  }
}
