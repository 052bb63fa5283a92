package graft

/** Timed dashboard refresh — the reference's hot path (~20 sequential SQL
  * statements per `GET /index/`, myapp/views.py:394-681) measured as one
  * concurrent Spark materialization. Usage: DashboardBench [sfDir].
  */
object DashboardBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(defaultCpus = 32)
    // warm (first refresh pays JVM/codegen)
    Dashboard.collectIndexConcurrently(spark, dir)
    val t0 = System.nanoTime()
    val counts = Dashboard.collectIndexConcurrently(spark, dir)
    val warmSec = (System.nanoTime() - t0) / 1e9
    println(f"dashboard refresh (${counts.size}%d sections, warm): $warmSec%.3f s")
    println(counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
