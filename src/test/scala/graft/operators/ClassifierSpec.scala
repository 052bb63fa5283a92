package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.HashFunctions.classifier_margin

/** x11 model-based quality filtering: the hashing-trick linear margin is
  * additive over tokens, bucket-stable, NULL-propagating, and the gate's
  * hash-derived pseudo-model agrees with an INDEPENDENT recomputation
  * through Spark's builtin md5/conv expression path (different code from
  * the kernel's MessageDigest). A deployment-shaped trained vector runs
  * through the same expression.
  */
class ClassifierSpec extends SparkSuite {

  import spark.implicits._

  private val gateW = TextOps.GateClassifierWeights

  test("margin is additive over tokens and linear in repetition") {
    def m(text: String): Long =
      Seq(text).toDF("text")
        .select(classifier_margin(col("text"), gateW, "w:").as("m"))
        .collect().head.getLong(0)
    val a = m("alpha")
    val b = m("beta")
    assert(m("alpha beta") == a + b)
    assert(m("alpha alpha alpha") == 3 * a)
    // tokenization is the shared trim/lower/split: case and padding fold
    assert(m("  ALPHA  beta ") == a + b)
  }

  test("gate pseudo-model agrees with an independent builtin-md5 recomputation") {
    val docs = graft.Catalog.documents(spark, sfDir).limit(64)
    val kernel = TextOps.classifierScoresOf(docs, gateW)
      .select(col("doc_id"), col("margin"))
    // (hash60('w:'||t) % 2001) - 1000, summed — via Spark's md5/conv
    // builtins + HOF aggregate, no graft kernel involved
    val viaBuiltins = docs.select(col("doc_id"),
      aggregate(
        transform(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+"),
          t => conv(substring(md5(concat(lit("w:"), t)), 1, 15), 16, 10)
            .cast("long") % 2001 - 1000),
        lit(0L), (acc, x) => acc + x).as("margin"))
    assert(kernel.exceptAll(viaBuiltins).isEmpty
      && viaBuiltins.exceptAll(kernel).isEmpty)
  }

  test("NULL text propagates NULL margin and NULL keep; keep cut is margin >= 0") {
    val tmp = Files.createTempDirectory("graft-clf").toString
    Seq((1L, "good solid tokens"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.classifierScores(spark, tmp).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2))
    val m1 = byId(1L).getLong(1)
    assert(byId(1L).getBoolean(2) == (m1 >= 0))
  }

  test("a deployment-shaped trained weight vector binds through the same path") {
    // uniform weights make the margin a pure token count — pins that every
    // token contributes exactly one bucket lookup
    val uniform = Seq.fill(17)(3L)
    val got = Seq((1L, "one two three"), (2L, "solo"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        classifier_margin(col("text"), uniform, "w:").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 9L && got(2L) == 3L)
    // and a non-uniform vector actually discriminates buckets: two
    // different tokens may share a 17-bucket model, so compare against the
    // 2001-bucket gate model where "alpha" and "beta" land apart
    val a = Seq("alpha").toDF("text")
      .select(classifier_margin(col("text"), gateW, "w:")).collect().head.getLong(0)
    val b = Seq("beta").toDF("text")
      .select(classifier_margin(col("text"), gateW, "w:")).collect().head.getLong(0)
    assert(a != b)
  }

  test("the margin expression stays inside whole-stage codegen") {
    val df = spark.range(2).toDF("id")
      .selectExpr("concat('tok', CAST(id AS STRING)) AS text")
      .select(classifier_margin(col("text"), gateW, "w:").as("m"))
      .filter(col("m").isNotNull)
    assert(df.count() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("classifier_margin"))
        .forall(_.replaceFirst("^[\\s+:-]*", "").startsWith("*(")),
      s"classifier_margin fell out of whole-stage codegen:\n$plan")
  }
}
