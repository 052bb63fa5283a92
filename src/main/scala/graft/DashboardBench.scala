package graft

import org.apache.spark.sql.SparkSession

/** Timed dashboard refresh — the reference's hot path (~20 sequential SQL
  * statements per `GET /index/`, myapp/views.py:394-681) measured as one
  * concurrent Spark materialization. Usage: DashboardBench [sfDir].
  */
object DashboardBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm (first refresh pays JVM/codegen)
    Dashboard.collectIndexConcurrently(spark, dir)
    val t0 = System.nanoTime()
    val counts = Dashboard.collectIndexConcurrently(spark, dir)
    val warmSec = (System.nanoTime() - t0) / 1e9
    println(f"dashboard refresh (12 sections, warm): $warmSec%.3f s")
    println(counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
