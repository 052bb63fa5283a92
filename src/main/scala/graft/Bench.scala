package graft



/** Benchmark main (driver contract): every registered query at the
  * SPARK_GRAFT_SF_DIR scale, one JSON line of per-query wall seconds.
  *
  * Methodology: the session is warmed first (one job + file-listing of every
  * fixture table) so no query pays JVM/codegen/IO-listing startup; each
  * query materializes fully through the `noop` datasource v2 sink — unlike
  * `count()`, noop cannot let Catalyst prune away projected expressions, so
  * the timing covers the whole operator including its projections.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    // warmup: JVM + codegen + parquet footer/listing + OS page caches.
    // Must be a noop WRITE, not count(): count() is satisfied from parquet
    // footers alone and decodes zero column bytes, leaving the first query
    // on each table to pay cold-IO inside its own timing.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Catalog.tableNames.foreach { t =>
      try Catalog.table(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a crashed query times at ~0 s; without a failure marker the JSON
    // would read as a speed-up — record failures in-band
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
