package graft.lifecycle

import java.nio.file.{Files, Path, Paths}

import graft.{Scratch, SparkSuite}

/** The mutation pipelines' scratch copies BACK TABLES — the name→path
  * mapping the statement surface registers, and the lazy DataFrame each
  * pipeline returns. Round-8 ADVICE: parking them under the 24 h RUN TTL
  * let a later same-kind sweep reap a registered table out from under a
  * reader (parquet reads refresh no mtime). The pipelines now use
  * table-TTL scratch; these specs re-run a pipeline after its previous
  * run's table has aged past the run TTL and show the old table still
  * reads clean.
  */
class SqlTableTtlSpec extends SparkSuite {

  // every freshTableDir call must actually sweep (the throttle would
  // otherwise mask a wrong-TTL regression by skipping the reap entirely)
  spark.conf.set("spark.graft.scratch.sweep.interval.minutes", "0")

  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.scratch.sweep.interval.minutes")
    super.afterAll()
  }

  /** Age every entry of a subtree: the sweep's deep-mtime veto treats any
    * fresh descendant as live, so simulating "a table from yesterday with
    * no writes since" must age all of it.
    */
  private def ageTree(p: Path, days: Int): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try st.forEach(c => ageTree(c, days)) finally st.close()
    }
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - days.toLong * 24 * 3600 * 1000))
  }

  private def runsUnder(kind: String): Set[Path] = {
    val base = Paths.get(Scratch.artifactPath(spark, kind, "v1", sfDir))
    if (!Files.exists(base)) Set.empty
    else {
      val st = Files.list(base)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(_.getFileName.toString.startsWith("run_"))
          .toSet
      } finally st.close()
    }
  }

  private def pipelineSurvivesRunTtl(kind: String,
      run: => org.apache.spark.sql.DataFrame): Unit = {
    val first = run
    val firstCount = first.count()
    assert(firstCount > 0)
    val firstRuns = runsUnder(kind)
    assert(firstRuns.nonEmpty, s"no run dirs under $kind after a pipeline run")
    // a day passes with no writes to the first run's table (reads would
    // not refresh any mtime) — past the 24 h run TTL, inside the 7-day
    // general TTL
    firstRuns.foreach(ageTree(_, days = 2))
    // a later pipeline run sweeps the kind; under the old run-TTL binding
    // this reaped the aged table and broke `first` mid-read
    run.count()
    assert(first.count() == firstCount,
      "a registered mutation table aged past the run TTL must still serve " +
        "reads — table state is governed by the general artifact TTL")
  }

  test("s19 mutation tables outlive the run TTL under a later sweep") {
    pipelineSurvivesRunTtl("sql_mutation_run",
      SqlMutations.sqlMutationPipeline(spark, sfDir))
  }

  test("s21 merge tables outlive the run TTL under a later sweep") {
    pipelineSurvivesRunTtl("sql_merge_run",
      SqlMutations.sqlMergePipeline(spark, sfDir))
  }
}
