package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.scalatest.funsuite.AnyFunSuite

/** Catalog.readEvolved: the long-lived-table read contract — files written
  * across schema generations align to one expected serving schema.
  */
class SchemaEvolutionSpec extends SparkSuite {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("evolve").toString
    // generation 1: (doc_id INT, text) — before `lang` existed, and with
    // doc_id written narrow
    Seq((1, "alpha"), (2, "beta"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(d)
    // generation 2: `lang` added, doc_id still INT
    Seq((3, "gamma", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(d)
    // generation 3: `legacy_flag` column that the serving contract retired
    Seq((4, "delta", "fr", true))
      .toDF("doc_id", "text", "lang", "legacy_flag")
      .write.mode("append").parquet(d)
    d
  }

  private val contract = StructType(Seq(
    StructField("doc_id", LongType),      // wider than any file's INT
    StructField("text", StringType),
    StructField("lang", StringType),      // absent from generation 1
    StructField("quality", DoubleType)))  // not yet backfilled anywhere

  test("rows from every generation align to the serving contract") {
    val df = Catalog.readEvolved(spark, dir, contract)
    assert(df.schema == contract)
    val rows = df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), Option(r.getString(2)), r.isNullAt(3)))).toMap
    assert(rows.size == 4)
    assert(rows(1L) == (("alpha", None, true)), "gen-1 rows: lang NULL")
    assert(rows(3L) == (("gamma", Some("en"), true)))
    assert(rows(4L) == (("delta", Some("fr"), true)))
  }

  test("columns retired from the contract are dropped, not resurrected") {
    assert(!Catalog.readEvolved(spark, dir, contract)
      .schema.fieldNames.contains("legacy_flag"))
  }

  test("a plain single-footer read would mis-serve the same files") {
    // the motivating hazard: without mergeSchema the footer Spark happens
    // to pick decides whether `lang` exists at all — readEvolved must not
    // inherit that nondeterminism (asserted via its stable contract above;
    // here: the merged union really does carry all four physical columns)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet ==
      Set("doc_id", "text", "lang", "legacy_flag"))
  }

  test("incompatible same-name types fail fast (corruption, not evolution)") {
    val bad = Files.createTempDirectory("evolve-bad").toString
    Seq((1, "x")).toDF("doc_id", "text").write.mode("append").parquet(bad)
    Seq(("oops", "y")).toDF("doc_id", "text").write.mode("append").parquet(bad)
    val thrown = intercept[Exception] {
      Catalog.readEvolved(spark, bad, contract).collect()
    }
    assert(thrown.getMessage != null)
  }
}
