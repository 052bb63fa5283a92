package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** z15 epoch-shuffle semantics: the two-level (bucket + prefix-sum)
  * construction must reconstruct the naive global hash rank exactly, and
  * each epoch's positions must be a bijection onto 1..n.
  */
class EpochShuffleSpec extends SparkSuite {

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("positions per epoch are a bijection onto 1..n") {
    val got = Pipeline.epochShuffleOf(ids(257), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 3 * 257)
    got.groupBy(_._1).foreach { case (e, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to 257L),
        s"epoch $e positions are not a permutation")
    }
  }

  test("two-level decomposition equals the naive global window rank") {
    val naive = ids(311)
      .crossJoin(broadcast(spark.range(2).select(col("id").as("epoch"))))
      .select(col("epoch"), col("doc_id"),
        TextOps.hash60(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))).as("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch")).orderBy(col("h"), col("doc_id"))))
      .select(col("epoch"), col("doc_id"), col("pos").cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Pipeline.epochShuffleOf(ids(311), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("decomposition is bucket-shift invariant (the deployment knob)") {
    // 16 buckets (shift 56) and the default 4096 must both reconstruct
    // the same global rank — the prefix is order-preserving at any width
    val a = Pipeline.epochShuffleOf(ids(199), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Pipeline.epochShuffleOf(ids(199), 2, bucketShift = 56)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("different epochs produce different orders; reruns are identical") {
    def orderOf(e: Long) = Pipeline.epochShuffleOf(ids(64), 2)
      .filter(col("epoch") === e).orderBy(col("pos"))
      .collect().map(_.getLong(1)).toSeq
    assert(orderOf(0L) !== orderOf(1L),
      "epoch salt did not change the permutation")
    assert(orderOf(0L) === orderOf(0L), "permutation not deterministic")
  }

  test("fixture gate entry: EpochCount full permutations of the corpus") {
    val docs = graft.Catalog.documents(spark, sfDir).count()
    val got = Pipeline.epochShuffle(spark, sfDir)
    assert(got.count() === Pipeline.EpochCount * docs)
    val perEpoch = got.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("maxp"),
        min(col("pos")).as("minp"))
      .collect()
    assert(perEpoch.length === Pipeline.EpochCount)
    perEpoch.foreach { r =>
      assert(r.getLong(1) === docs && r.getLong(2) === docs &&
        r.getLong(3) === 1L,
        s"epoch ${r.getLong(0)} is not a 1..$docs permutation")
    }
  }
}
