package graft.lifecycle

import org.apache.spark.sql.DataFrame

/** Physical table LAYOUT for repeated-join workloads: hash-bucketed,
  * per-bucket-sorted parquet registered in the session catalog.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
  * sides on the key — every join, every day. Writing both tables bucketed
  * by the join key (same bucket count) pays that shuffle ONCE at layout
  * time: a later join reads co-located buckets and Spark plans a
  * SortMergeJoin with NO Exchange on either side; a `groupBy` on the
  * bucket key likewise aggregates without a shuffle, because the bucketed
  * scan already reports hash-distribution on the key
  * (BucketedLayoutSpec asserts both plans are Exchange-free, with
  * broadcast disabled so the proof is about bucketing, not table size).
  *
  * Pick the bucket count like shuffle partitions: buckets ≫ cores for
  * parallelism, bucket size within a task budget; both join sides MUST
  * use the same count or Spark re-shuffles the mismatched side.
  */
object Layout {

  /** Write `df` as a bucketed+sorted parquet table at `path`, registered
    * as `name` in the session catalog (bucketing metadata lives in the
    * catalog — a plain `spark.read.parquet` of the same files would not
    * see it).
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
}
