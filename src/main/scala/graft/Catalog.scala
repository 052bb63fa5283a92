package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-provided parquet fixtures.
  *
  * The reference engine (mdhasanmeraj/Real-time-database-monitoring-system)
  * declares its schemas out-of-band (reference `myapp/models.py:1-119` is fully
  * commented out; `README.md:15`) and accesses columns positionally. We instead
  * centralize all table access here so every operator reads through one place
  * and schema discipline (ns-timestamp normalization, column pruning) is
  * applied uniformly.
  *
  * `events` is the stand-in for the reference's append-only metric time series
  * (`admin.system_metrics`, reference `myapp/models.py:35-46`): monotonic id +
  * event-time timestamp + numeric measure + entity key.
  */
object Catalog {

  /** All fixture tables, by basename under the sf directory. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** The filesystem OWNING a path (`Path.getFileSystem`), never the
    * default FS: a table at `s3a://…` must not resolve against an
    * `hdfs://` default (`FileSystem.get(conf)` throws Wrong FS — or worse,
    * silently reports a same-named default-FS path).
    */
  private[graft] def fsFor(p: String,
      spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Plain parquet read; filters/projections push down to the scan. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events"     => events(spark, dir)
      case "documents"  => documents(spark, dir)
      case "embeddings" => embeddings(spark, dir)
      case other        => readStable(spark, path(dir, other))
    }

  /** Schema-pinned parquet read for IMMUTABLE relations — the fixture
    * tables and the content-keyed [[Scratch]] artifacts. A bare
    * `spark.read.parquet(p)` runs a footer-inference Spark JOB on every
    * call (~60–130 ms of scheduling + listing at local scale), and the
    * iterative operators (the k-family supersteps) and the fd family's
    * per-table artifact serves issue DOZENS of such reads per query —
    * measured on k1: 16 of its 27 jobs were footer reads (optimization
    * guide §5 "the driver should do almost no data work"). The schema of
    * these paths cannot change within a JVM (fixtures are the driver's
    * read-only inputs; artifact paths embed a content fingerprint +
    * builder version), so we infer it ONCE per path and serve every
    * subsequent read with the schema provided — zero jobs, and each call
    * still gets a fresh DataFrame (fresh attribute ids — the iterative
    * thunk contract is untouched). MUTABLE engine-written tables
    * (Lifecycle/Stats/Streams paths, whose schemas legitimately evolve
    * mid-run) keep the bare per-call read.
    */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private[graft] def readStable(spark: SparkSession, p: String): DataFrame = {
    val s = schemaMemo.computeIfAbsent(p, _ => spark.read.parquet(p).schema)
    spark.read.schema(s).parquet(p)
  }

  /** [[readStable]]'s sibling for ENGINE-WRITTEN (mutable) flat tables —
    * the lifecycle pipelines re-read their run-dir tables after every
    * mutation step, paying the same footer-inference job each time (s15
    * measured ~9 zero-record "parquet at" jobs of 20-80 ms each). Here
    * the schema CAN change mid-run (archive adds a column), so the memo
    * is keyed by the table dir's MODIFICATION TIME: every write path
    * (staged-swap rename, append's new part file, overwrite's dir
    * re-create) creates or renames entries in the dir and bumps its
    * mtime, invalidating the entry — schema evolution is picked up,
    * back-to-back reads of an unchanged table skip the job. Any stat
    * failure falls back to the bare read so error behavior (missing
    * path etc.) is unchanged. Not for partitioned dirs (partition-column
    * inference has its own rules) — their read sites stay bare.
    */
  private val mutableSchemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.sql.types.StructType)]()

  private[graft] def readCurrent(spark: SparkSession, p: String): DataFrame = {
    val mtime =
      try fsFor(p, spark)
        .getFileStatus(new org.apache.hadoop.fs.Path(p)).getModificationTime
      catch { case scala.util.control.NonFatal(_) => -1L }
    if (mtime < 0) spark.read.parquet(p)
    else {
      val cached = mutableSchemaMemo.get(p)
      val s =
        if (cached != null && cached._1 == mtime) cached._2
        else {
          val inferred = spark.read.parquet(p).schema
          mutableSchemaMemo.put(p, (mtime, inferred))
          inferred
        }
      spark.read.schema(s).parquet(p)
    }
  }

  /** The events (metric stream) table.
    *
    * Fixture generations have stored `ts` under different physical parquet
    * encodings — TIMESTAMP(NANOS) in some, plain TIMESTAMP(MICROS) in others.
    * A 100 TB lakehouse receives files from many writers, so this read adapts
    * to the OBSERVED type instead of asserting one encoding:
    *
    *   - `LongType`: the file is TIMESTAMP(NANOS) read via
    *     `spark.sql.legacy.parquet.nanosAsLong` (Spark's vectorized reader
    *     rejects ns timestamps, [PARQUET_TYPE_ILLEGAL]); truncate to µs —
    *     exactly what DuckDB does when it coerces ns → its native µs
    *     TIMESTAMP — so both engines see identical values.
    *   - `TimestampNTZType`: plain µs timestamp without UTC adjustment; cast
    *     to session-TZ TimestampType (the session is pinned UTC, so values
    *     are identical and the driver's schema_match vs DuckDB's TIMESTAMP
    *     holds).
    *   - `TimestampType`: pass through.
    *
    * The `nanosAsLong` conf is set idempotently before the read so the nanos
    * branch works under any session (driver-created sessions included); it is
    * a no-op for non-nanos files.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readStable(spark, path(dir, "events"))
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected ns-as-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP); fixture at " + path(dir, "events"))
    }
  }

  /** Fail-fast schema guard: analyze every registry table and fail with the
    * table NAME and OBSERVED schema on the first problem. Bench/Smoke call
    * this up front so a driver-side fixture regeneration produces ONE clear
    * "events table unreadable: <cause>" diagnostic instead of N mysterious
    * per-query failures (round-8 lesson: a swallowed per-table Throwable in
    * the warmup turned one fixture change into 35 red queries).
    */
  def assertReadable(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      try table(spark, dir, t).schema // analysis forced; no job launched
      catch { case e: Throwable =>
        val physical =
          try spark.read.parquet(path(dir, t)).schema.treeString
          catch { case inner: Throwable => s"<unreadable: ${inner.getMessage}>" }
        throw new IllegalStateException(
          s"table '$t' at ${path(dir, t)} failed analysis: ${e.getMessage}\n" +
            s"observed physical schema:\n$physical", e)
      }
    }

  /** ANALYZE-style persisted statistics for an engine-written table
    * (SURVEY.md §4; computed by [[graft.lifecycle.Stats.analyze]], refreshed
    * by `Lifecycle.compact` — the VACUUM ANALYZE path). None until analyzed.
    */
  def tableStats(spark: SparkSession, tablePath: String): Option[DataFrame] =
    graft.lifecycle.Stats.read(spark, tablePath)

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** Widen drifted integer columns back to BIGINT where the operator code
    * reads them as long. No-op (no cast in the plan, pushdown untouched)
    * when the schema is already canonical; a cast only appears for a
    * drifted file. The trade under drift, stated honestly: the ENGINE
    * keeps working (driver-side getLong collects included) and value
    * hashes still match the oracle (the compare stringifies values), but
    * schema_match can go false on queries projecting the column raw,
    * since DuckDB serves the file's own integer width — a partial,
    * diagnosable red instead of r8's total one. Pinning the oracle SQL
    * to ::BIGINT everywhere would close even that; deliberately not done
    * wholesale (static oracle churn is its own gate risk). Name matching
    * is case-insensitive, mirroring Spark's own resolution — a
    * case-drifted DOC_ID still resolves in queries, so it must also
    * still widen.
    */
  private def widenToLong(df: DataFrame, names: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    names.foldLeft(df) { (d, c) =>
      d.schema.find(_.name.equalsIgnoreCase(c)).map(f => (f.name, f.dataType)) match {
        case Some((actual, ByteType | ShortType | IntegerType)) =>
          d.withColumn(actual, col(actual).cast(LongType))
        case _ => d
      }
    }
  }

  /** Fail the catalog read — not N downstream queries — when a required
    * column is missing entirely (a renamed/dropped column is the one
    * drift widening cannot absorb). Case-insensitive like resolution.
    */
  private def requireColumns(df: DataFrame, table: String,
      names: Seq[String], at: String): DataFrame = {
    val missing = names.filterNot(c =>
      df.schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"$table: required column(s) ${missing.mkString(", ")} absent from " +
        s"fixture at $at; observed schema:\n${df.schema.treeString}")
    df
  }

  /** The documents (text corpus) table — the events.ts adaptive-read
    * discipline applied to its drift-prone columns: a regeneration that
    * writes 32-bit ids/counts (pandas/pyarrow defaults vary) widens back
    * to the BIGINT every consumer reads.
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    widenToLong(
      requireColumns(readStable(spark, path(dir, "documents")),
        "documents", Seq("doc_id", "text"), path(dir, "documents")),
      Seq("doc_id", "n_chars"))

  /** The embeddings table. The vector kernels (`cosine_sim`,
    * `dot_product`, `block_norms`) are float32-typed, and numpy writers
    * flip between float32 and float64 by default — adapt the OBSERVED
    * element type instead of asserting one: a float64 (or integer-typed)
    * vector casts down to the kernels' element type on read; ids widen
    * like documents'. Anything else fails with a named diagnostic here
    * rather than N per-query analysis errors.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = widenToLong(
      requireColumns(readStable(spark, path(dir, "embeddings")),
        "embeddings", Seq("vec_id", "embedding"), path(dir, "embeddings")),
      Seq("vec_id"))
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      // one drift policy with widenToLong: every numeric element width a
      // writer plausibly emits adapts to the kernels' float32. Under
      // float64 drift the oracle computes on the wider values, so
      // 6-dp-rounded similarity scores CAN diverge at rounding borders —
      // engine survival is chosen over oracle agreement for drifted
      // fixtures (canonical fixtures are float32 and unaffected).
      case ArrayType(DoubleType | ByteType | ShortType | IntegerType | LongType, _) =>
        raw.withColumn("embedding",
          col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding: unsupported physical type $other (expected " +
          "an array of float/double/int); fixture at " + path(dir, "embeddings"))
    }
  }

  /** Write a time-series table date-partitioned (`dt=YYYY-MM-DD/` dirs) —
    * the 100 TB layout for the metric/event family (SURVEY.md §4
    * partitioning plan): every time-range predicate prunes whole partition
    * directories before any IO, and per-day rewrites (retention, S15) stay
    * local to one partition.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", to_date(col(tsCol)))
      .repartition(col("dt")) // one shuffle → one writer wave per day
      .write.partitionBy("dt").mode("overwrite").parquet(path)

  /** Read a date-partitioned table; `dt` filters prune partitions. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a parquet table whose FILES carry evolved schemas — the
    * long-lived-table reality at 100 TB: years of daily writes accrete
    * columns, and old files simply lack the new ones. `mergeSchema`
    * unions all footers (rows from pre-column files surface the column
    * as NULL), then the result aligns to the caller's EXPECTED serving
    * schema: expected-but-absent columns materialize as typed NULLs,
    * narrower physical types cast up (INT history under a LONG
    * contract), columns retired from the contract drop, and order pins
    * to the contract — so downstream operators never see a
    * write-history-dependent shape. Schema CONFLICTS (same column,
    * incompatible types) still fail fast in the merge, which is the
    * correct outcome: that is corruption, not evolution.
    */
  def readEvolved(spark: SparkSession, path: String,
      expected: org.apache.spark.sql.types.StructType): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    // presence must match Spark's OWN column resolution — the session
    // resolver follows spark.sql.caseSensitive and is locale-independent,
    // where an exact-string (or default-locale-lowercased) check would
    // silently NULL a column a plain select resolves, or claim presence
    // for one it doesn't
    val resolver = spark.sessionState.analyzer.resolver
    val physical = merged.schema.fieldNames.toSeq
    val aligned = expected.fields.toSeq.map { f =>
      if (physical.exists(resolver(_, f.name)))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    merged.select(aligned: _*)
  }

  /** Storage metadata table — the engine-native mapping of the reference's
    * `pg_total_relation_size` / `pg_relation_size` introspection
    * (myapp/views.py:427-430,471; SURVEY.md §2.8): one row per registered
    * table with file count and on-disk bytes from a filesystem listing,
    * plus the size_pretty rendering the reference displays.
    */
  def storageMetrics(spark: SparkSession, dir: String): DataFrame = {
    val fs = fsFor(dir, spark)
    val rows = tableNames.map { t =>
      val p = new org.apache.hadoop.fs.Path(path(dir, t))
      if (fs.exists(p)) {
        val summary = fs.getContentSummary(p)
        (t, summary.getFileCount, summary.getLength)
      } else (t, 0L, 0L)
    }
    import spark.implicits._
    rows.toDF("table_name", "file_count", "total_bytes")
      .withColumn("pretty_size",
        graft.expressions.functions.size_pretty(col("total_bytes")))
      .orderBy(col("table_name"))
  }

  /** Engine/session metadata — maps the reference's `version()` and
    * `pg_postmaster_start_time()` (myapp/views.py:539,546,582): Spark
    * version and session uptime, duration formatted like the reference's
    * interval display.
    */
  def engineInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val startMs = spark.sparkContext.startTime
    val upSec = (System.currentTimeMillis() - startMs) / 1000
    Seq((spark.version, new java.sql.Timestamp(startMs), upSec))
      .toDF("engine_version", "session_start", "uptime_s")
      .withColumn("uptime",
        graft.expressions.functions.format_duration(col("uptime_s")))
  }

  /** Pinned "now" for every time-relative predicate.
    *
    * The reference's activity queries all depend on `now()` (reference
    * `myapp/views.py:402,405,414,419`); for deterministic, oracle-checkable
    * results our queries take an as-of instant pinned just after the fixture's
    * event horizon (events span 2024-01-01 .. 2024-01-30). SURVEY.md §7.4.
    */
  val AsOf = "2024-02-01 00:00:00"
}
