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

  // --- s23: Z-order 2-D skipping ---------------------------------------

  private val zu = Some((0L, 3L))
  private val zw = Some((Skip.ZGateWindow._1, Skip.ZGateWindow._2))

  test("z-order skip-scan equals the plain 2-D predicate scan row for row") {
    val viaZ = Skip.zSkipScan(spark, sfDir, zu, zw)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val plain = Catalog.events(spark, sfDir)
      .filter(col("user_id") >= 0L && col("user_id") <= 3L &&
        col("ts") >= lit(zw.get._1).cast("timestamp") &&
        col("ts") < lit(zw.get._2).cast("timestamp"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(viaZ == plain && plain.nonEmpty)
  }

  test("one z-layout prunes on EITHER dimension; the 1-D ts layout cannot") {
    val total = spark.read.parquet(Skip.zClusteredEvents(spark, sfDir))
      .inputFiles.length
    // user-range-only query: the z-layout skips...
    val userOnly = Skip.selectFilesZ(spark, sfDir, zu, None)
    assert(userOnly.nonEmpty && userOnly.length < total,
      s"z-layout user-only: ${userOnly.length} of $total")
    // ...while the ts-range-clustered layout's zonemaps intersect the
    // full user range in EVERY file (no user clustering -> no skipping)
    val tsStats = spark.read.parquet(Skip.fileStats(spark, sfDir))
    val (uLo, uHi) = (zu.get._1, zu.get._2)
    val tsLayoutHits = spark.read
      .parquet(Skip.clusteredEvents(spark, sfDir))
      .groupBy(col("_metadata.file_path"))
      .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
      .filter(col("hi") >= uLo && col("lo") <= uHi)
      .count()
    assert(tsLayoutHits == tsStats.count(),
      "the 1-D ts layout was expected to open every file for a user query")
    // ts-only query: the z-layout still skips on time too
    val tsOnly = Skip.selectFilesZ(spark, sfDir, None,
      Some(("2024-01-02 00:00:00", "2024-01-05 00:00:00")))
    assert(tsOnly.nonEmpty && tsOnly.length < total,
      s"z-layout ts-only: ${tsOnly.length} of $total")
    // both dimensions constrain -> at least as sharp as either alone
    val both = Skip.selectFilesZ(spark, sfDir, zu,
      Some(("2024-01-02 00:00:00", "2024-01-05 00:00:00")))
    assert(both.length <= math.min(userOnly.length, tsOnly.length))
  }

  test("z-key interleaving: adjacent cells differ in low bits (locality)") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (255, 255), (15, 3))
      .toDF("x", "y")
      .select(Skip.zkey(col("x"), col("y")).as("z"))
      .collect().map(_.getInt(0))
    // interleave(x=odd bits, y=even bits): hand-computed Morton codes
    assert(rows.toSeq == Seq(0, 2, 1, 0xFFFF, 0xAF))
  }
}
