package graft

/** Dev plan dump, whole registry: write every registered query's formatted
  * physical plan to one file per query — the input for plan-level audits
  * (cartesian products, single-partition sorts, pushed-filter checks)
  * without paying a JVM per query.
  * Usage: tools/run.sh graft.QExplainAll <sfDir> <outDir> [namePrefix]
  */
object QExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val prefix = if (args.length > 2) args(2) else ""
    outDir.mkdirs()
    val spark = GraftSession.local(defaultCpus = 32, logLevel = "ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith(prefix)) {
        val out = new java.io.File(outDir, s"$name.txt")
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(out, "UTF-8")
          try w.write(plan) finally w.close()
          println(s"ok   $name (${plan.length} chars)")
        } catch { case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
