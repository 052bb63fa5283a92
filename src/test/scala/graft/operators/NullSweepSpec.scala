package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Catalog, SparkEntry, SparkSuite}

/** Robustness net, the NULL companion to EmptyFixtureSpec's zero-row
  * sweep: every registered query must EXECUTE against a fixture where
  * every table carries rows whose non-key columns are all NULL — the
  * partially-populated rows a 100 TB ingest constantly produces (late
  * enrichment, schema evolution, upstream bugs). Semantics per query are
  * pinned by the oracles and the targeted Null*Specs; this sweep pins
  * only "no query throws on NULL-bearing input".
  */
class NullSweepSpec extends SparkSuite {

  // key columns stay valid (a NULL primary key is a different pathology —
  // data corruption, not partial population)
  private val KeyCols = Set(
    "event_id", "doc_id", "vec_id", "o_orderkey", "l_orderkey",
    "l_linenumber", "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
    "r_regionkey")

  private lazy val nullDir: String = {
    val tmp = Files.createTempDirectory("graft-nullsweep").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Catalog.tableNames.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      // two "hollow" rows per table: keys shifted past the live range,
      // every other column NULL
      val hollow = df.limit(2).select(df.schema.fields.map { f =>
        if (KeyCols.contains(f.name)) (col(f.name) + lit(1000000)).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      df.unionAll(hollow).write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  test("every registered query executes on a NULL-bearing fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nullDir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries failed on NULL-bearing input:\n${failures.mkString("\n")}")
  }
}
