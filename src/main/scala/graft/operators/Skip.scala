package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.Catalog

/** File-statistics data skipping for plain-parquet tables — the
  * Delta/Iceberg zonemap shape without a table format: a write-time
  * range-clustered layout plus a persisted per-file (min, max) relation,
  * so a windowed query opens ONLY the files whose range intersects the
  * window instead of listing-and-filtering the whole table.
  *
  * Why this exists next to partition pruning (`Catalog.
  * writePartitionedByDate`, CatalogPartitionSpec): partitioning prunes at
  * directory granularity and burns a column on the path; zonemaps prune at
  * FILE granularity on any orderable column, and the same stats relation
  * serves any number of columns. Parquet row-group min/max (which b2
  * already exploits) still applies INSIDE each opened file — this layer
  * keeps the files from being opened at all.
  *
  * Scale shape: the layout is `repartitionByRange` on the skip column —
  * write-time clustering is what gives zonemaps their selectivity (on a
  * randomly-laid-out table every file intersects every window and nothing
  * skips; the spec demonstrates both). The stats relation is one row per
  * FILE — metadata-sized, the same planning-cost class as a Delta log or
  * an Iceberg manifest, persisted once per layout build. At query time the
  * window filter runs over the stats relation in Spark and only the
  * MATCHING file paths reach the driver — which is the list Spark's own
  * FileIndex would hold anyway, minus the pruned files. Both relations are
  * [[graft.Scratch]] artifacts (content-fingerprinted, `_SUCCESS`-gated),
  * so a regenerated fixture rebuilds rather than serving stale ranges.
  */
object Skip {

  /** Format tag — bump when the layout or stats schema changes. */
  private val LayoutVersion = "tsrange16-v1"

  /** Target file count for the clustered layout (a deployment derives this
    * from table bytes / target file size; the gate pins it).
    */
  val LayoutFiles = 16

  private val statsSchema = StructType(Seq(
    StructField("file", StringType),
    StructField("lo", TimestampType),
    StructField("hi", TimestampType),
    StructField("nrows", LongType)))

  /** The ts-range-clustered events layout (built once per fixture). */
  private[operators] def clusteredEvents(spark: SparkSession, dir: String): String =
    graft.Scratch.materialize(spark, "events_tsrange", LayoutVersion, dir) {
      staging =>
        Catalog.events(spark, dir)
          .repartitionByRange(LayoutFiles, col("ts"))
          .write.parquet(staging)
    }

  // --- shared zonemap scaffold (s22 linear + s23 z-order + any future
  // --- clustered layout): stats build, stats-filtered file selection,
  // --- selected-files scan with the empty fallback -----------------------

  /** Per-file zonemap builder: one aggregation pass grouped by
    * `_metadata.file_path`, coalesced to one metadata-sized artifact.
    */
  private def buildFileStats(spark: SparkSession, dir: String, layout: String,
      name: String, version: String, aggs: Seq[Column]): String =
    graft.Scratch.materialize(spark, name, version, dir) { staging =>
      spark.read.schema(Catalog.events(spark, dir).schema).parquet(layout)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(aggs.head, aggs.tail: _*)
        .coalesce(1).write.parquet(staging)
    }

  /** File paths whose zonemap row satisfies `pred` — the filter runs in
    * Spark over the stats relation; only matching paths reach the driver.
    */
  private def matchingFiles(spark: SparkSession, statsPath: String,
      schema: StructType, pred: Column): Seq[String] =
    spark.read.schema(schema).parquet(statsPath)
      .filter(pred).select(col("file")).collect().map(_.getString(0)).toSeq

  /** Open exactly `sel` with the events schema; zero files → an empty
    * relation WITH the schema (explicit: a pruned-to-nothing read must
    * not depend on footer inference).
    */
  private def scanSelected(spark: SparkSession, dir: String,
      sel: Seq[String]): DataFrame = {
    val schema = Catalog.events(spark, dir).schema
    if (sel.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(sel: _*)
  }

  /** The per-file zonemap relation for the clustered layout. */
  private[operators] def fileStats(spark: SparkSession, dir: String): String =
    buildFileStats(spark, dir, clusteredEvents(spark, dir),
      "events_tsrange_stats", LayoutVersion,
      Seq(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        count(lit(1)).as("nrows")))

  /** File paths whose [lo, hi] range intersects the half-open window
    * [loTs, hiTs).
    */
  private[operators] def selectFiles(spark: SparkSession, dir: String,
      loTs: String, hiTs: String): Seq[String] =
    matchingFiles(spark, fileStats(spark, dir), statsSchema,
      col("hi") >= lit(loTs).cast("timestamp") &&
        col("lo") < lit(hiTs).cast("timestamp"))

  /** Windowed scan over the clustered layout opening ONLY intersecting
    * files, with the exact predicate re-applied (zonemaps overapproximate:
    * a file may intersect the window without every row matching).
    */
  def skipScan(spark: SparkSession, dir: String,
      loTs: String, hiTs: String): DataFrame =
    scanSelected(spark, dir, selectFiles(spark, dir, loTs, hiTs))
      .filter(col("ts") >= lit(loTs).cast("timestamp") &&
        col("ts") < lit(hiTs).cast("timestamp"))

  // gate window: a 6-hour mid-horizon slice (events span Jan 2024)
  val GateLo = "2024-01-10 00:00:00"
  val GateHi = "2024-01-10 06:00:00"

  /** Gate entry: per-minute accounting of the skip-scanned window. The
    * oracle is the SAME aggregate over the PLAIN events table — the
    * layout + zonemap is an execution strategy, not a semantic change
    * (the d6/b2 artifact discipline applied to scans). Integer-exact
    * measures (count + min/max id), no float sums.
    */
  def statsSkip(spark: SparkSession, dir: String): DataFrame =
    skipScan(spark, dir, GateLo, GateHi)
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("minute"))

  val statsSkipSql: String =
    s"""SELECT date_trunc('minute', ts) AS minute,
       | CAST(count(*) AS BIGINT) AS n,
       | min(event_id) AS min_id, max(event_id) AS max_id
       |FROM events
       |WHERE ts >= TIMESTAMP '$GateLo' AND ts < TIMESTAMP '$GateHi'
       |GROUP BY 1 ORDER BY 1""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // S23 — Z-ORDER (multi-dimensional) clustering: s22's zonemap machinery
  // with a space-filling-curve layout, so ONE layout serves range
  // predicates on EITHER (or both) of two columns. Linear clustering
  // (s22) is perfect for its one column and useless for every other —
  // under it a user-range query intersects every file. Interleaving the
  // bits of (user_id, ts) keeps both dimensions' locality: each file
  // covers a small rectangle of the (user, time) plane, so per-file
  // min/max on BOTH columns skip on whichever dimension a query
  // constrains — the Delta/Iceberg OPTIMIZE ZORDER BY shape, built from
  // public first principles (Morton 1966).
  //
  // The z-key is pure codegen'd Column arithmetic: each dimension scales
  // to 8 bits against its observed bounds (one tiny agg at layout-build
  // time — a BUILD cost, like the layout write itself), then the classic
  // magic-mask spread interleaves them. At 100 TB the layout build is
  // one repartitionByRange over the z-key (the same single shuffle any
  // OPTIMIZE pays) and the stats relation stays one row per file.
  // ---------------------------------------------------------------------
  private val ZLayoutVersion = "zorder8x8-v1"

  /** Spread an 8-bit value's bits to even positions (Morton magic masks). */
  private[operators] def spreadBits8(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0F))
    val b = (a.bitwiseOR(shiftleft(a, 2))).bitwiseAND(lit(0x3333))
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(0x5555))
  }

  /** Morton-interleave two 8-bit bucket columns into a 16-bit z-key. */
  private[operators] def zkey(x8: Column, y8: Column): Column =
    shiftleft(spreadBits8(x8), 1).bitwiseOR(spreadBits8(y8))

  /** Scale `c` to an 8-bit bucket against inclusive bounds [lo, hi]. */
  private[operators] def bucket8(c: Column, lo: Long, hi: Long): Column =
    least(lit(255), ((c - lit(lo)) * 256L / lit(math.max(1L, hi - lo + 1))))
      .cast("int")

  private val zStatsSchema = StructType(Seq(
    StructField("file", StringType),
    StructField("u_lo", LongType), StructField("u_hi", LongType),
    StructField("t_lo", TimestampType), StructField("t_hi", TimestampType),
    StructField("nrows", LongType)))

  /** The z-order-clustered events layout over (user_id, ts). */
  private[operators] def zClusteredEvents(spark: SparkSession, dir: String): String =
    graft.Scratch.materialize(spark, "events_zorder", ZLayoutVersion, dir) {
      staging =>
        val ev = Catalog.events(spark, dir)
        // dimension bounds: one tiny agg, driver state = 4 scalars.
        // min/max are NULL over an empty table (the sequencePackAuto
        // lesson) — any bounds work there, the layout writes zero rows
        val b = ev.agg(
          min(col("user_id")), max(col("user_id")),
          min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
          .head()
        def at(i: Int, dflt: Long): Long = if (b.isNullAt(i)) dflt else b.getLong(i)
        val z = zkey(
          bucket8(col("user_id"), at(0, 0L), at(1, 1L)),
          bucket8(unix_timestamp(col("ts")), at(2, 0L), at(3, 1L)))
        ev.withColumn("__z", z)
          .repartitionByRange(LayoutFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
          .write.parquet(staging)
    }

  /** Two-dimensional per-file zonemaps for the z-order layout. */
  private[operators] def zFileStats(spark: SparkSession, dir: String): String =
    buildFileStats(spark, dir, zClusteredEvents(spark, dir),
      "events_zorder_stats", ZLayoutVersion,
      Seq(min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
        min(col("ts")).as("t_lo"), max(col("ts")).as("t_hi"),
        count(lit(1)).as("nrows")))

  /** Files whose 2-D zonemap rectangle intersects the query rectangle
    * (user_id in [uLo, uHi] × ts in [loTs, hiTs)). An unconstrained
    * dimension passes None and prunes on the other alone — the
    * one-layout-serves-both property the spec pins.
    */
  private[operators] def selectFilesZ(spark: SparkSession, dir: String,
      users: Option[(Long, Long)], window: Option[(String, String)]): Seq[String] = {
    val uPred = users.map { case (lo, hi) =>
      col("u_hi") >= lo && col("u_lo") <= hi
    }.getOrElse(lit(true))
    val tPred = window.map { case (lo, hi) =>
      col("t_hi") >= lit(lo).cast("timestamp") &&
        col("t_lo") < lit(hi).cast("timestamp")
    }.getOrElse(lit(true))
    matchingFiles(spark, zFileStats(spark, dir), zStatsSchema, uPred && tPred)
  }

  /** 2-D skip scan: open only rectangle-intersecting files, re-apply the
    * exact predicate (zonemaps overapproximate).
    */
  def zSkipScan(spark: SparkSession, dir: String,
      users: Option[(Long, Long)], window: Option[(String, String)]): DataFrame = {
    val uPred = users.map { case (lo, hi) =>
      col("user_id") >= lo && col("user_id") <= hi
    }.getOrElse(lit(true))
    val tPred = window.map { case (lo, hi) =>
      col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp")
    }.getOrElse(lit(true))
    scanSelected(spark, dir, selectFilesZ(spark, dir, users, window))
      .filter(uPred && tPred)
  }

  // gate rectangle: a user slice crossed with a mid-horizon fortnight —
  // absolute bounds so the same predicate is valid at every SF (user_id
  // cardinality scales with SF; 0..39 is a strict subset from sf0.01 up
  // and the full population at sf0.001 — correctness is unaffected
  // either way, the SPEC demonstrates the pruning)
  val ZGateUsers: (Long, Long) = (0L, 39L)
  val ZGateWindow: (String, String) = ("2024-01-08 00:00:00", "2024-01-22 00:00:00")

  /** Gate entry: per-event-type accounting of the 2-D-pruned rectangle;
    * oracle is the same aggregate over the plain table (layout + zonemap
    * is an execution strategy, not a semantic change).
    */
  def zorderSkip(spark: SparkSession, dir: String): DataFrame =
    zSkipScan(spark, dir, Some(ZGateUsers), Some(ZGateWindow))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))

  val zorderSkipSql: String =
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       | min(event_id) AS min_id, max(event_id) AS max_id
       |FROM events
       |WHERE user_id >= ${ZGateUsers._1} AND user_id <= ${ZGateUsers._2}
       | AND ts >= TIMESTAMP '${ZGateWindow._1}'
       | AND ts < TIMESTAMP '${ZGateWindow._2}'
       |GROUP BY 1 ORDER BY 1""".stripMargin.replace('\n', ' ')

  val all: Seq[Q] = Seq(
    Q("s22_stats_skip", statsSkip, Some(statsSkipSql),
      "file-statistics data skipping: range-clustered layout + persisted per-file zonemaps, windowed scan opens only intersecting files (scan-strategy extension)"),
    Q("s23_zorder_skip", zorderSkip, Some(zorderSkipSql),
      "Z-order (Morton-interleaved) two-dimensional clustering + 2-D per-file zonemaps: one layout prunes range predicates on user_id, ts, or both (scan-strategy extension)"))
}
