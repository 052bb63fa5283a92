package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registered query (or all).
  * Usage: Explain [queryName] [sfDir] — the performance iteration loop:
  * check PushedFilters / ReadSchema / broadcast choice / WholeStageCodegen
  * spans after every operator change (builder prompt "explain and iterate").
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = name match {
      case Some(n) => SparkEntry.registry.filter(_.name == n)
      case None    => SparkEntry.registry
    }
    targets.foreach { q =>
      println(s"\n===== ${q.name} =====")
      q.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
