package graft.lifecycle

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The literal DELETE/UPDATE statement surface: Spark-parser routing onto
  * the Lifecycle rewrite ops, SQL assignment semantics, and rejection of
  * everything that is not a mutation statement.
  */
class SqlMutationsSpec extends SparkSuite {

  private def seed(rows: Seq[(Long, String, Double)]): String = {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-sqlmut").toString + "/t"
    rows.toDF("id", "kind", "value").write.parquet(path)
    path
  }

  private def readBack(path: String) =
    spark.read.parquet(path).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("DELETE removes exactly the predicate-true rows; NULL-safe") {
    val path = seed(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
    SqlMutations.execute(spark, "DELETE FROM t WHERE kind = 'a'", _ => path)
    assert(readBack(path) == Seq((2L, "b", 2.0)))
  }

  test("WHERE-less DELETE empties the table, schema kept") {
    val path = seed(Seq((1L, "a", 1.0)))
    SqlMutations.execute(spark, "DELETE FROM t", _ => path)
    val df = spark.read.parquet(path)
    assert(df.count() == 0 && df.columns.toSeq == Seq("id", "kind", "value"))
  }

  test("multi-assignment UPDATE evaluates right-hand sides against the OLD row") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-sqlmut").toString + "/t"
    Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "a", "b")
      .write.parquet(path)
    // the swap: sequential withColumn evaluation would yield a = b = 20
    SqlMutations.execute(spark, "UPDATE t SET a = b, b = a WHERE id = 1",
      _ => path)
    val got = spark.read.parquet(path).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 20.0, 10.0), (2L, 30.0, 40.0)))
  }

  test("UPDATE SET targets resolve case-insensitively; duplicates are rejected") {
    val path = seed(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // Spark resolves identifiers case-insensitively by default — the
    // statement surface must match (round-7 review)
    SqlMutations.execute(spark, "UPDATE t SET VALUE = 9.0 WHERE kind = 'a'",
      _ => path)
    assert(readBack(path) == Seq((1L, "a", 9.0), (2L, "b", 2.0)))
    intercept[IllegalArgumentException] {
      SqlMutations.execute(spark, "UPDATE t SET value = 1, VALUE = 2", _ => path)
    }
    assert(readBack(path) == Seq((1L, "a", 9.0), (2L, "b", 2.0)))
  }

  test("UPDATE of a non-existent column fails and leaves the table intact") {
    val path = seed(Seq((1L, "a", 1.0)))
    intercept[IllegalArgumentException] {
      SqlMutations.execute(spark, "UPDATE t SET nope = 1", _ => path)
    }
    assert(readBack(path) == Seq((1L, "a", 1.0)))
  }

  test("non-mutation statements are rejected") {
    val path = seed(Seq((1L, "a", 1.0)))
    for (stmt <- Seq("SELECT * FROM t", "DROP TABLE t", "TRUNCATE TABLE t"))
      intercept[IllegalArgumentException] {
        SqlMutations.execute(spark, stmt, _ => path)
      }
    assert(readBack(path) == Seq((1L, "a", 1.0)))
  }
}
