package graft.lifecycle

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.Catalog

/** Corrupt-file quarantine — the ops reality of a 100 TB table: a torn
  * write, a bad disk, or a half-replicated object eventually leaves an
  * unreadable parquet file in a healthy directory, and ONE such file
  * fails every full scan of the table. Spark's own lever
  * (`spark.sql.files.ignoreCorruptFiles`) silently drops the bytes —
  * queries "succeed" while quietly reading less data, the worst failure
  * mode a pipeline can have. Quarantine inverts that: unreadable files
  * MOVE to a sibling `<table>.quarantine/` tree with a full accounting
  * returned to the caller, so the table heals explicitly, the loss is
  * named, and the damaged bytes stay available for forensics/re-ingest
  * (same rationale as [[Lifecycle]]'s `.bak` swap protocol — never
  * destroy evidence during recovery).
  *
  * Validation = opening the parquet footer (magic bytes + metadata
  * deserialization), the same read every query's planning does; a file
  * that passes serves scans, one that fails cannot. Driver-side loop
  * here (footer reads are metadata-sized); a deployment with millions of
  * files distributes the same check via `spark.parallelize(files)` with
  * a serialized Hadoop conf — the per-file validator below is already
  * side-effect-free.
  */
object Quarantine {

  final case class Report(keptFiles: Int, quarantined: Seq[String]) {
    def healthy: Boolean = quarantined.isEmpty
  }

  /** True iff the parquet footer opens and deserializes. */
  private def footerReadable(
      f: org.apache.hadoop.fs.FileSystem, p: Path)(
      implicit spark: SparkSession): Boolean =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter ne null finally r.close()
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Validate every `*.parquet` data file under `tablePath`; move the
    * unreadable ones to `<tablePath>.quarantine/<file>` and return the
    * accounting. Idempotent: a healthy table sweeps to a no-op. Refuses
    * nothing — quarantining EVERY file is a legitimate outcome the
    * caller's report inspection must handle (`report.keptFiles == 0`
    * means the table has no serving data left).
    */
  def sweep(tablePath: String)(implicit spark: SparkSession): Report = {
    val fs = Catalog.fsFor(tablePath, spark)
    val root = new Path(tablePath)
    if (!fs.exists(root)) return Report(0, Seq.empty)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          b += s.getPath
      }
      b.result()
    }
    val (ok, bad) = files.partition(footerReadable(fs, _))
    if (bad.nonEmpty) {
      val qRoot = new Path(tablePath.stripSuffix("/") + ".quarantine")
      fs.mkdirs(qRoot)
      bad.foreach { p =>
        require(fs.rename(p, new Path(qRoot, p.getName)),
          s"failed to quarantine $p — table left as-is for this file")
      }
    }
    Report(ok.size, bad.map(_.getName).sorted)
  }
}
