package graft

/** Smoke-run of the driver contract: `entry` rows>0 plus every registered
  * query executed once on sf0.001 — the fastest "is the library alive"
  * check. Mirrors the driver's own smoke (builder prompt). Exits non-zero
  * when the flagship entry is empty, so `smoke && …` chains are
  * machine-checkable (a query that throws already crashes the JVM).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(defaultCpus = 8)
    // one clear "table X unreadable: cause + schema" beats a wall of
    // per-query failures when the driver regenerates fixtures
    Catalog.assertReadable(spark, dir)
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n " + (if (n > 0) "OK" else "EMPTY!"))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val rows = fn(spark, dir).count()
      println(f"$name%-28s rows=$rows")
    }
    println(s"registered=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
