package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PII redaction semantics on a constructed corpus (the synthetic
  * fixtures carry no PII): emails, phone-ish digit runs, and IPv4
  * literals become typed tags; counts report what was scrubbed; clean
  * text passes through byte-identical; NULL text stays NULL.
  */
class RedactSpec extends SparkSuite {

  private lazy val corpus: String = {
    val tmp = Files.createTempDirectory("graft-redact").toString
    import spark.implicits._
    Seq(
      (1L, Option("contact bob.smith+x@corp.example.com or +1 (415) 555-0100 now")),
      (2L, Option("server at 10.0.42.7 timed out, then 10.0.42.8 replied")),
      (3L, Option("a perfectly clean sentence with no identifiers")),
      (4L, Option.empty[String]),
      (5L, Option("two mails a@b.co c@d.org and a phone 020 7946 0958")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("emails, phones, and IPs are tagged; counts match; clean text unchanged") {
    def intOr(r: org.apache.spark.sql.Row, i: Int): Int =
      if (r.isNullAt(i)) -1 else r.getInt(i)
    val got = TextOps.redactDocuments(spark, corpus).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), intOr(r, 2), intOr(r, 3), intOr(r, 4))))
      .toMap
    val (t1, e1, i1, p1) = got(1L)
    assert(t1.get == "contact <EMAIL> or <PHONE> now", s"got $t1")
    assert((e1, i1, p1) == ((1, 0, 1)))
    val (t2, e2, i2, p2) = got(2L)
    assert(t2.get == "server at <IP> timed out, then <IP> replied")
    assert((e2, i2, p2) == ((0, 2, 0)))
    val (t3, e3, i3, p3) = got(3L)
    assert(t3.get == "a perfectly clean sentence with no identifiers")
    assert((e3, i3, p3) == ((0, 0, 0)))
    assert(got(4L)._1.isEmpty, "NULL text stays NULL")
    val (t5, e5, i5, p5) = got(5L)
    assert(t5.get == "two mails <EMAIL> <EMAIL> and a phone <PHONE>")
    assert((e5, i5, p5) == ((2, 0, 1)))
  }
}
