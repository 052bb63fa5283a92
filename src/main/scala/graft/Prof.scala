package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev stage-level attribution: run one registered query through the noop
  * sink (the bench methodology) with a stage listener, and print per-stage
  * wall time, task time, records and shuffle bytes — the "which operator is
  * the time going to" answer QTime's single wall number can't give.
  * Usage: tools/run.sh graft.Prof <sfDir> <queryName> [repeats]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(defaultCpus = 32, logLevel = "ERROR")
    // ad-hoc conf experiments: PROF_CONF="key=val;key=val" (runtime confs only)
    sys.env.get("PROF_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        System.err.println(s"[prof] conf $k=$v")
      })
    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
        records: Long, shuffleReadMB: Double, shuffleWriteMB: Double)
    val stages = mutable.ArrayBuffer.empty[St]
    // job timeline: start/end wall-clock per job + the scheduling GAP since
    // the previous job ended — driver/planning time the stage table can't see
    case class Jb(id: Int, t0: Long, var t1: Long)
    val jobs = mutable.ArrayBuffer.empty[Jb]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += Jb(e.jobId, e.time, -1L) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'),
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.executorRunTime,
            m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    })
    val fn = SparkEntry.queries(name)
    // prewarm (bench parity: artifacts are offline cost) + one warm pass
    try {
      operators.Dedup.prewarmIndexes(spark, sfDir)
      operators.Similarity.prewarmIndexes(spark, sfDir)
      operators.Search.prewarmIndexes(spark, sfDir)
      operators.Multimodal.prewarmIndexes(spark, sfDir)
      operators.Graph.prewarmIndexes(spark, sfDir)
      operators.Profile.prewarmIndexes(spark, sfDir)
      operators.TextOps.prewarmIndexes(spark, sfDir)
    } catch { case _: Throwable => () }
    (1 to repeats).foreach { i =>
      stages.synchronized(stages.clear())
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val wall0 = System.currentTimeMillis()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain so late stage/job events land in
      // THIS run's snapshot instead of the next repeat's buffer
      Thread.sleep(200)
      if (i == repeats) jobs.synchronized {
        var prevEnd = wall0
        println(f"${"job"}%5s ${"gap_ms"}%7s ${"run_ms"}%7s")
        jobs.sortBy(_.t0).foreach { j =>
          println(f"${j.id}%5d ${j.t0 - prevEnd}%7d " +
            f"${(if (j.t1 > 0) j.t1 else j.t0) - j.t0}%7d")
          prevEnd = math.max(prevEnd, if (j.t1 > 0) j.t1 else j.t0)
        }
        println(f"tail_gap ${System.currentTimeMillis() - prevEnd}%d ms")
      }
      println(f"== run $i: $s%.3f s, ${stages.synchronized(stages.size)} stages ==")
      if (i == repeats) stages.synchronized {
        println(f"${"stage"}%5s ${"wall_ms"}%8s ${"task_ms"}%8s " +
          f"${"records"}%12s ${"shufR_MB"}%9s ${"shufW_MB"}%9s  name")
        stages.sortBy(-_.wallMs).take(30).foreach { st =>
          println(f"${st.id}%5d ${st.wallMs}%8d ${st.taskMs}%8d " +
            f"${st.records}%12d ${st.shuffleReadMB}%9.2f " +
            f"${st.shuffleWriteMB}%9.2f  ${st.name.take(70)}")
        }
      }
    }
    spark.stop()
  }
}
