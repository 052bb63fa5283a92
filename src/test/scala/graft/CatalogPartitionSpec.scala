package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Date-partitioned layout: directory structure + partition pruning. */
class CatalogPartitionSpec extends SparkSuite {

  test("writePartitionedByDate produces dt= dirs and prunes on read") {
    val path = Files.createTempDirectory("graft_part_").toString + "/events"
    Catalog.writePartitionedByDate(Catalog.events(spark, sfDir), "ts", path)

    val dtDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("dt=")).map(_.getName).sorted
    assert(dtDirs.length >= 28, s"expected ~30 day partitions, got ${dtDirs.length}")
    assert(dtDirs.head == "dt=2024-01-01")

    val pruned = Catalog.readPartitioned(spark, path)
      .filter(col("dt") === "2024-01-15")
    // partition pruning must reach the scan: only one partition's files read
    val scanned = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scanned.nonEmpty)
    assert(scanned.head.partitionFilters.nonEmpty,
      "dt predicate did not become a partition filter")
    // the executed scan reports how many partition dirs survived pruning
    val partCount = scanned.head.metadata.get("PartitionFilters")
    assert(partCount.exists(_.contains("dt")), s"metadata: ${scanned.head.metadata}")
    val dayRows = pruned.count()
    val expectedDayRows = Catalog.events(spark, sfDir)
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(dayRows == expectedDayRows && dayRows > 0)

    // content round-trips (modulo the added dt column)
    val total = Catalog.readPartitioned(spark, path).count()
    assert(total == Catalog.events(spark, sfDir).count())
  }
}
