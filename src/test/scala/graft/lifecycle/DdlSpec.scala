package graft.lifecycle

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The SQL DDL surface: CREATE TABLE IF NOT EXISTS idempotence, CHECK
  * enforcement on the write path, and catalog round-trips — parity with
  * the reference's `db_helpers.py` user_roles management.
  */
class DdlSpec extends SparkSuite {

  private def freshLoc(): String =
    java.nio.file.Files.createTempDirectory("graft-ddl").toString + "/user_roles"

  test("CREATE TABLE IF NOT EXISTS user_roles is idempotent via spark.sql") {
    import spark.implicits._
    val loc = freshLoc()
    spark.sql("DROP TABLE IF EXISTS user_roles")
    Ddl.setupRolesTable(spark, loc)
    Ddl.insertOverwriteChecked(spark, "user_roles",
      Seq((1L, "Admin"), (2L, "User")).toDF("user_id", "role"))
    // second create must be a no-op, not a wipe or an error
    Ddl.setupRolesTable(spark, loc)
    val got = spark.table("user_roles").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "Admin"), (2L, "User")))
    // the CHECK is recorded in the catalog's table properties
    val props = spark.sql("SHOW TBLPROPERTIES user_roles").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.check").exists(_.contains("role IN")))
  }

  test("CHECK on write rejects out-of-domain roles and aborts the insert") {
    import spark.implicits._
    val loc = freshLoc()
    spark.sql("DROP TABLE IF EXISTS user_roles")
    Ddl.setupRolesTable(spark, loc)
    Ddl.insertOverwriteChecked(spark, "user_roles",
      Seq((1L, "Admin")).toDF("user_id", "role"))
    val bad = Seq((2L, "Superuser")).toDF("user_id", "role")
    intercept[IllegalArgumentException] {
      Ddl.insertOverwriteChecked(spark, "user_roles", bad)
    }
    // the failed statement must not have clobbered the table
    assert(spark.table("user_roles").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // NULL role and NULL user_id are violations too (NOT NULL in reference)
    intercept[IllegalArgumentException] {
      Ddl.insertOverwriteChecked(spark, "user_roles",
        Seq((Some(3L), Option.empty[String])).toDF("user_id", "role"))
    }
  }

  test("concurrent sqlDdlRoles calls on distinct tables both succeed") {
    // round-6 verdict: fixed staging identifiers raced DROP TABLE vs
    // INSERT across concurrent callers; staging names are now per-call
    // unique and the target table is parameterizable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Ddl.sqlDdlRolesAs(spark, sfDir, "user_roles_cc_a").collect())
    val fb = Future(Ddl.sqlDdlRolesAs(spark, sfDir, "user_roles_cc_b").collect())
    val (a, b) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(a.nonEmpty && a.sameElements(b))
    spark.sql("DROP TABLE IF EXISTS user_roles_cc_a")
    spark.sql("DROP TABLE IF EXISTS user_roles_cc_b")
  }

  test("the recorded CHECK property quotes its role literals (valid SQL)") {
    val loc = freshLoc()
    spark.sql("DROP TABLE IF EXISTS user_roles_q")
    Ddl.setupRolesTable(spark, loc, "user_roles_q")
    val props = spark.sql("SHOW TBLPROPERTIES user_roles_q").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.check") ==
      "CHECK (role IN ('Admin', 'Moderator', 'User') AND user_id IS NOT NULL)")
    spark.sql("DROP TABLE IF EXISTS user_roles_q")
  }

  test("s18 gate query derives the reference's role tiers deterministically") {
    val out = Ddl.sqlDdlRoles(spark, sfDir)
    val roles = out.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(roles.nonEmpty)
    roles.foreach { case (id, role) =>
      val expect =
        if (id % 100 == 0) "Admin" else if (id % 10 == 0) "Moderator" else "User"
      assert(role == expect, s"user $id: $role != $expect")
    }
    assert(out.columns.toSeq == Seq("user_id", "role"))
  }
}
