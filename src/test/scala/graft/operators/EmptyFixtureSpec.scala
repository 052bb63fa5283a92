package graft.operators

import java.nio.file.Files

import graft.{Catalog, SparkEntry, SparkSuite}

/** Robustness: every registered query must execute (not necessarily return
  * rows) against a zero-row fixture with the production schemas — the
  * degenerate partitions a 100 TB run constantly produces (empty date
  * partitions, filters matching nothing) must never throw.
  */
class EmptyFixtureSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val tmp = Files.createTempDirectory("graft-empty-sf0").toString
    // events must keep its on-disk shape (ts = TIMESTAMP(NANOS), read as
    // long under nanosAsLong) — round-trip the raw file, not Catalog.events
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Catalog.tableNames.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  test("every registered query executes on a zero-row fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed on empty input:\n${failures.mkString("\n")}")
  }
}
