package graft.lifecycle

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The bucketed-layout claim, proven on executed plans: after writing both
  * join sides bucketed by the key, the join and a key-grouped aggregate
  * run with NO Exchange anywhere — the one-time layout shuffle replaces
  * every future join/agg shuffle. Broadcast is disabled for the duration
  * so the joins can't cheat via table size, and results are checked
  * against the plain (shuffling) plans.
  */
class BucketedLayoutSpec extends SparkSuite {

  private def withConf[A](k: String, v: String)(f: => A): A = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  test("bucketed join and key-grouped aggregate plan with zero Exchanges") {
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    val orders = graft.Catalog.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
    val cust = graft.Catalog.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    Layout.writeBucketed(orders, "bl_orders", s"$tmp/o", "o_custkey", 8)
    Layout.writeBucketed(cust, "bl_cust", s"$tmp/c", "o_custkey", 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val bo = spark.table("bl_orders")
      val bc = spark.table("bl_cust")

      val joined = bo.join(bc, "o_custkey")
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin"), s"expected SMJ:\n$jPlan")
      assert(!jPlan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$jPlan")

      val agg = bo.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"aggregate on the bucket key must not shuffle:\n$aPlan")

      // same results as the plain shuffling plans
      assert(joined.count() ==
        orders.join(cust, "o_custkey").count())
      assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bl_orders")
      spark.sql("DROP TABLE IF EXISTS bl_cust")
    }
  }
}
