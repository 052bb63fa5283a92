package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's `ts` physical encoding has changed across driver
  * fixture generations (TIMESTAMP(NANOS) → plain µs), and a Catalog that
  * asserts one encoding breaks every downstream query at once (round 8:
  * 35/90 gate entries and 30 tests red from one hard-coded branch). These
  * specs pin the contract: `Catalog.events` adapts to the OBSERVED type and
  * yields identical values under every encoding a writer may produce, and
  * `Catalog.assertReadable` turns a bad fixture into one diagnostic that
  * names the table and its observed schema.
  */
class CatalogSchemaSpec extends SparkSuite {

  private val t0 = Timestamp.valueOf("2024-01-15 10:30:00")
  private val t1 = Timestamp.valueOf("2024-01-15 10:30:05")

  /** Write an events-shaped parquet whose `ts` uses the given writer. */
  private def writeVariant(dir: String)(tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, t0, 10.0, "u1"), (2L, t1, 20.0, "u2"))
      .toDF("id", "raw_ts", "value", "user")
      .withColumn("ts", tsCol).drop("raw_ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readTs(dir: String): Seq[Timestamp] =
    Catalog.events(spark, dir).select("ts").orderBy("ts")
      .collect().map(_.getTimestamp(0)).toSeq

  test("events adapts to ns-as-long, TIMESTAMP_NTZ, and TIMESTAMP encodings") {
    val base = Files.createTempDirectory("graft_catalog_schema").toString
    val expected = Seq(t0, t1)

    // old fixtures: TIMESTAMP(NANOS) surfaces as LongType under nanosAsLong
    writeVariant(s"$base/nanos")(
      (unix_micros(col("raw_ts")) * lit(1000L)).as("ts"))
    assert(readTs(s"$base/nanos") == expected)

    // current fixtures: plain µs without UTC adjustment → TIMESTAMP_NTZ
    writeVariant(s"$base/ntz")(col("raw_ts").cast(TimestampNTZType))
    assert(Catalog.events(spark, s"$base/ntz").schema("ts").dataType ==
      TimestampType)
    assert(readTs(s"$base/ntz") == expected)

    // a session-TZ timestamp writer: pass-through
    writeVariant(s"$base/tz")(col("raw_ts"))
    assert(readTs(s"$base/tz") == expected)
  }

  test("documents widens drifted 32-bit id/count columns back to BIGINT") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_catalog_docs").toString
    // a pandas/pyarrow regeneration that wrote int32 ids and counts
    Seq((1, "hello world", "en", "web", 11), (2, "bye", "en", "web", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/documents.parquet")
    val got = Catalog.documents(spark, base)
    assert(got.schema("doc_id").dataType == LongType)
    assert(got.schema("n_chars").dataType == LongType)
    // consumers read ids as long — the r8 shape this guards against
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // and the canonical fixture reads cast-free (no plan degradation)
    assert(!Catalog.documents(spark, sfDir).queryExecution
      .analyzed.toString.contains("cast(doc_id"))
  }

  test("a renamed required column fails the CATALOG read with a named diagnostic") {
    import spark.implicits._
    // widening can't absorb a dropped/renamed column — it must fail once
    // at the catalog, not as ~30 per-query unresolved-column errors
    val base = Files.createTempDirectory("graft_catalog_docs_missing").toString
    Seq((1L, "hello")).toDF("id", "text")
      .write.parquet(s"$base/documents.parquet")
    val err = intercept[IllegalStateException](Catalog.documents(spark, base))
    assert(err.getMessage.contains("doc_id") &&
      err.getMessage.contains("documents"))
  }

  test("a case-drifted int32 id column still widens (Spark resolves case-insensitively)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_catalog_docs_case").toString
    Seq((7, "hello")).toDF("DOC_ID", "text")
      .write.parquet(s"$base/documents.parquet")
    val got = Catalog.documents(spark, base)
    assert(got.schema.fields.exists(f =>
      f.name == "DOC_ID" && f.dataType == LongType))
    assert(got.select(col("doc_id")).collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("embeddings adapts a float64 vector down to the kernels' float32") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_catalog_emb").toString
    // a numpy-default regeneration: float64 vector, int32 id
    Seq((1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$base/embeddings.parquet")
    val got = Catalog.embeddings(spark, base)
    assert(got.schema("vec_id").dataType == LongType)
    assert(got.schema("embedding").dataType == ArrayType(FloatType, true) ||
      got.schema("embedding").dataType == ArrayType(FloatType, false))
    // the float32 vector kernels must analyze and run against the read
    val sim = got.select(graft.expressions.VectorFunctions.cosine_sim(
        col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sim.forall(s => math.abs(s - 1.0) < 1e-6))
    // the canonical fixture passes through cast-free
    assert(!Catalog.embeddings(spark, sfDir).queryExecution
      .analyzed.toString.contains("cast(embedding"))
    // an unsupported vector type names the column and the observed type
    val bad = Files.createTempDirectory("graft_catalog_emb_bad").toString
    Seq((1L, "not a vector")).toDF("vec_id", "embedding")
      .write.parquet(s"$bad/embeddings.parquet")
    val err = intercept[IllegalStateException](Catalog.embeddings(spark, bad))
    assert(err.getMessage.contains("embeddings.embedding"))
  }

  test("an unsupported ts encoding fails with a named, schema-bearing error") {
    val base = Files.createTempDirectory("graft_catalog_guard").toString
    writeVariant(base)(date_format(col("raw_ts"), "yyyy-MM-dd HH:mm:ss"))

    val direct = intercept[IllegalStateException](Catalog.events(spark, base))
    assert(direct.getMessage.contains("events.ts"))
    assert(direct.getMessage.contains("StringType"))

    // assertReadable over a full fixture dir: link every healthy table from
    // the real sf0.001 fixtures, perturb only events — the guard must name
    // the broken table and print the physical schema it observed
    val full = Files.createTempDirectory("graft_catalog_guard_full").toString
    Catalog.tableNames.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(full, s"$t.parquet"), Paths.get(sfDir, s"$t.parquet"))
    }
    writeVariant(full)(date_format(col("raw_ts"), "yyyy-MM-dd HH:mm:ss"))
    val guard = intercept[IllegalStateException](
      Catalog.assertReadable(spark, full))
    assert(guard.getMessage.contains("table 'events'"))
    assert(guard.getMessage.contains("observed physical schema"))
    assert(guard.getMessage.contains("string"))

    // and the healthy fixture dir passes the guard outright
    Catalog.assertReadable(spark, sfDir)
  }
}
