package graft.lifecycle

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MERGE statement semantics on a hand-computed fixture: WHEN clauses
  * apply in statement order (first applicable wins), unmatched target
  * rows pass through, source rows with no applicable INSERT are dropped,
  * simultaneous assignment reads pre-merge values, ambiguous (>1 source
  * match) merges are rejected, and NOT MATCHED BY SOURCE is refused.
  */
class SqlMergeSpec extends SparkSuite {

  private def seed(): (String, String => String) = {
    val tmp = Files.createTempDirectory("graft-merge").toString
    import spark.implicits._
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "v", "tag").write.parquet(s"$tmp/t")
    Seq((1L, 100L, "upd"), (2L, 999L, "del"), (9L, 900L, "new"),
      (8L, 5L, "skip"))
      .toDF("id", "v", "tag").write.parquet(s"$tmp/src")
    (tmp, Map("t" -> s"$tmp/t", "src" -> s"$tmp/src"))
  }

  test("action order, passthrough, insert, and conditional-insert drop") {
    val (tmp, tables) = seed()
    SqlMutations.execute(spark,
      """MERGE INTO t USING src s ON t.id = s.id
        |WHEN MATCHED AND s.v > 500 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
        |WHEN NOT MATCHED AND s.v > 100 THEN INSERT (id, v, tag) VALUES (s.id, s.v, s.tag)
        |""".stripMargin, tables)
    val got = spark.read.parquet(s"$tmp/t").orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 110L, "a"), // matched, second arm: v = s.v + old t.v
      // 2 deleted by the first arm (s.v 999 > 500)
      (3L, 30L, "c"), // target-only: unchanged
      (9L, 900L, "new")), // inserted; id 8 fails the insert condition
      s"got $got")
  }

  test("conditional matched arm and simultaneous assignment semantics") {
    val (tmp, tables) = seed()
    SqlMutations.execute(spark,
      """MERGE INTO t USING src s ON t.id = s.id
        |WHEN MATCHED AND s.id = 1 THEN UPDATE SET v = t.id, id = t.v
        |""".stripMargin, tables)
    val got = spark.read.parquet(s"$tmp/t").orderBy(col("tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // id and v swap from PRE-merge values (id=1,v=10 → id=10,v=1)
    assert(got == Seq((10L, 1L, "a"), (2L, 20L, "b"), (3L, 30L, "c")),
      s"got $got")
  }

  test("a target row matching multiple source rows is rejected") {
    val (tmp, tables) = seed()
    import spark.implicits._
    Seq((1L, 7L, "x"), (1L, 8L, "y"))
      .toDF("id", "v", "tag").write.mode("overwrite").parquet(s"$tmp/src")
    val e = intercept[IllegalArgumentException] {
      SqlMutations.execute(spark,
        "MERGE INTO t USING src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET v = s.v", tables)
    }
    assert(e.getMessage.contains("multiple source rows"))
    // and the failed merge must NOT have touched the table
    assert(spark.read.parquet(s"$tmp/t").count() == 3)
  }

  test("NOT MATCHED BY SOURCE is refused") {
    val (_, tables) = seed()
    val e = intercept[IllegalArgumentException] {
      SqlMutations.execute(spark,
        "MERGE INTO t USING src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE", tables)
    }
    assert(e.getMessage.contains("NOT MATCHED BY SOURCE"))
  }
}
