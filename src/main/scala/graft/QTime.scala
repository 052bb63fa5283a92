package graft

/** Dev timing harness: run one registered query N times against an SF dir
  * and print per-run wall times — the profiling loop Bench's
  * median-of-3-over-everything is too coarse for.
  * Usage: tools/run.sh graft.QTime <sfDir> <queryName> [repeats]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.local(defaultCpus = 32, logLevel = "WARN")
    val fn = SparkEntry.queries(name)
    (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $s%.3f s ($n rows)")
    }
  }
}
