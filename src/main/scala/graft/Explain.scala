package graft

/** Print the formatted physical plan of one registered query (or all).
  * Usage: Explain [queryName] [sfDir] — the performance iteration loop:
  * check PushedFilters / ReadSchema / broadcast choice / WholeStageCodegen
  * spans after every operator change (builder prompt "explain and iterate").
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(defaultCpus = 8)
    val targets = name match {
      case Some(n) => SparkEntry.registry.filter(_.name == n)
      case None    => SparkEntry.registry
    }
    if (targets.isEmpty) {
      // an empty plan dump from a typo must not read as "no plan change"
      System.err.println(s"no such query: ${name.get}; registered queries:\n  " +
        SparkEntry.registry.map(_.name).sorted.mkString("\n  "))
      spark.stop()
      sys.exit(1)
    }
    targets.foreach { q =>
      println(s"\n===== ${q.name} =====")
      q.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
