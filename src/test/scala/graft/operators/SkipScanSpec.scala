package graft.operators

import org.apache.spark.sql.functions._

import graft.{Catalog, SparkSuite}

/** s22 file-statistics data skipping: the pruned scan is row-identical to
  * the plain predicate scan, opens strictly fewer files than the layout
  * holds, prunes to zero on an out-of-range window, and the pruning
  * actually reaches the executed read (inputFiles == selected files).
  */
class SkipScanSpec extends SparkSuite {

  private val lo = Skip.GateLo
  private val hi = Skip.GateHi

  test("skip-scan equals the plain predicate scan row for row") {
    val viaSkip = Skip.skipScan(spark, sfDir, lo, hi)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val plain = Catalog.events(spark, sfDir)
      .filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(viaSkip == plain && plain.nonEmpty)
  }

  test("a 6-hour window opens a strict subset of the clustered layout's files") {
    val sel = Skip.selectFiles(spark, sfDir, lo, hi)
    val total = spark.read.parquet(Skip.clusteredEvents(spark, sfDir))
      .inputFiles.length
    assert(sel.nonEmpty && sel.length < total,
      s"expected pruning: selected ${sel.length} of $total files")
    // the selection reaches the executed read — the scan's inputFiles are
    // exactly the zonemap-selected paths
    // both are file: URIs but render differently (file:/ vs file:///) —
    // compare the paths
    def p(u: String): String = new java.net.URI(u).getPath
    val scanned = Skip.skipScan(spark, sfDir, lo, hi).inputFiles.map(p).toSet
    assert(scanned == sel.map(p).toSet)
  }

  test("an out-of-range window prunes to zero files and zero rows, schema intact") {
    val df = Skip.skipScan(spark, sfDir, "2030-01-01 00:00:00",
      "2030-01-02 00:00:00")
    assert(df.collect().isEmpty)
    assert(df.schema == Catalog.events(spark, sfDir).schema)
  }

  test("zonemaps overapproximate: the exact predicate still filters inside files") {
    // window = one file's exact [lo, hi): the file is opened (it
    // intersects) but its max-ts row sits ON the excluded bound — it must
    // be filtered inside the file, not leak through the zonemap
    val stats = spark.read.parquet(Skip.fileStats(spark, sfDir))
      .collect().maxBy(_.getLong(3))
    val (flo, fhi) = (stats.getTimestamp(1), stats.getTimestamp(2))
    val df = Skip.skipScan(spark, sfDir, flo.toString, fhi.toString)
    val ts = df.select(col("ts")).collect().map(_.getTimestamp(0))
    assert(ts.nonEmpty)
    assert(ts.forall(t => !t.before(flo) && t.before(fhi)))
    // strictly fewer rows than the opened files hold — in-file filtering
    // did real work (at minimum the max-ts row dropped)
    val opened = df.inputFiles.length.toLong
    assert(opened >= 1 && ts.length < stats.getLong(3) * opened)
  }
}
