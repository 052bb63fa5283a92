package graft

/** Dev plan dump: print a registered query's formatted physical plan.
  * Usage: tools/run.sh graft.QExplain <sfDir> <queryName>
  */
object QExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(defaultCpus = 32, logLevel = "WARN")
    val mode = if (args.length > 2) args(2) else "formatted"
    SparkEntry.queries(args(1))(spark, args(0)).explain(mode)
  }
}
