package graft

import org.apache.spark.sql.SparkSession

/** Smoke-run of the driver contract: `entry` rows>0 plus every registered
  * query executed once on sf0.001 — the fastest "is the library alive"
  * check. Mirrors the driver's own smoke (builder prompt).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n " + (if (n > 0) "OK" else "EMPTY!"))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val rows = fn(spark, dir).count()
      println(f"$name%-28s rows=$rows")
    }
    println(s"registered=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
