package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** The per-file zonemap relation for the clustered layout: one
    * aggregation pass grouped by `_metadata.file_path`.
    */
  private[operators] def fileStats(spark: SparkSession, dir: String): String = {
    val layout = clusteredEvents(spark, dir)
    graft.Scratch.materialize(spark, "events_tsrange_stats", LayoutVersion, dir) {
      staging =>
        spark.read.schema(Catalog.events(spark, dir).schema).parquet(layout)
          .groupBy(col("_metadata.file_path").as("file"))
          .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
            count(lit(1)).as("nrows"))
          .coalesce(1).write.parquet(staging)
    }
  }

  /** File paths whose [lo, hi] range intersects the half-open window
    * [loTs, hiTs) — the filter runs in Spark over the stats relation; only
    * matching paths reach the driver.
    */
  private[operators] def selectFiles(spark: SparkSession, dir: String,
      loTs: String, hiTs: String): Seq[String] =
    spark.read.schema(statsSchema).parquet(fileStats(spark, dir))
      .filter(col("hi") >= lit(loTs).cast("timestamp") &&
        col("lo") < lit(hiTs).cast("timestamp"))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Windowed scan over the clustered layout opening ONLY intersecting
    * files, with the exact predicate re-applied (zonemaps overapproximate:
    * a file may intersect the window without every row matching).
    */
  def skipScan(spark: SparkSession, dir: String,
      loTs: String, hiTs: String): DataFrame = {
    val schema = Catalog.events(spark, dir).schema
    val sel = selectFiles(spark, dir, loTs, hiTs)
    val base =
      if (sel.isEmpty)
        // zero intersecting files — an empty relation with the table
        // schema (explicit schema: a pruned-to-nothing read must not
        // depend on footer inference)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(sel: _*)
    base.filter(col("ts") >= lit(loTs).cast("timestamp") &&
      col("ts") < lit(hiTs).cast("timestamp"))
  }

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

  val all: Seq[Q] = Seq(
    Q("s22_stats_skip", statsSkip, Some(statsSkipSql),
      "file-statistics data skipping: range-clustered layout + persisted per-file zonemaps, windowed scan opens only intersecting files (scan-strategy extension)"))
}
