package graft.lifecycle

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Corrupt-file quarantine: one garbage file fails the whole table scan;
  * the sweep names and removes exactly it, the table heals, the bytes
  * survive for forensics, and a healthy table sweeps to a no-op.
  */
class QuarantineSpec extends SparkSuite {

  private implicit val s: org.apache.spark.sql.SparkSession = spark

  test("sweep quarantines exactly the unreadable files and heals the scan") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-quar").toString + "/table"
    Seq(1L, 2L, 3L).toDF("id").repartition(2).write.parquet(t)
    // a torn write: parquet suffix, garbage bytes (no footer magic)
    Files.write(Paths.get(t, "part-junk.parquet"),
      "this is not parquet".getBytes("UTF-8"))
    // the corrupt file fails a full scan outright
    intercept[Exception] { spark.read.parquet(t).collect() }

    val r = Quarantine.sweep(t)
    assert(r.quarantined == Seq("part-junk.parquet") && !r.healthy)
    assert(r.keptFiles == 2, s"both healthy part files kept: $r")
    // the table reads again, data intact
    assert(spark.read.parquet(t).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // the damaged bytes survive for forensics, outside the table tree
    assert(Files.exists(Paths.get(s"$t.quarantine/part-junk.parquet")))
    // idempotent: the healed table sweeps to a no-op
    val again = Quarantine.sweep(t)
    assert(again.healthy && again.keptFiles == 2)
  }

  test("a missing table and an all-corrupt table report honestly") {
    val none = Quarantine.sweep("/nonexistent/graft-quar-none")
    assert(none.healthy && none.keptFiles == 0)
    val t = Files.createTempDirectory("graft-quar-all").toString + "/table"
    Files.createDirectories(Paths.get(t))
    Files.write(Paths.get(t, "only-junk.parquet"), Array[Byte](1, 2, 3))
    val r = Quarantine.sweep(t)
    assert(r.keptFiles == 0 && r.quarantined == Seq("only-junk.parquet"),
      s"no serving data left must be visible in the report: $r")
  }
}
