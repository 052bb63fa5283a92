package graft.lifecycle

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Catalog

/** S24 — versioned table commits with time-travel reads: the snapshot
  * pattern of the modern table formats (Iceberg/Delta) in its minimal
  * relational form. Every in-place mutation in [[Lifecycle]] (staged
  * rewrite + swap) destroys history; a versioned table never rewrites a
  * byte it has published — each commit adds immutable data files plus ONE
  * manifest naming the files that ARE version N, so any historical
  * version stays readable until retention drops it, and "what changed
  * between v_i and v_j" (u1's diff) runs over two cheap manifest-pruned
  * reads instead of restored backups.
  *
  * Layout (all paths relative to the table root):
  *   data/c<V>-<part>.parquet   immutable data files, version-prefixed
  *   _v/<V>                     manifest: line 1 = schema DDL, then one
  *                              data-file name per line
  *
  * The manifest carries the schema so a ZERO-file version (a rewrite that
  * filtered everything out) is still a readable empty relation — Spark
  * writes no part files for empty tasks, and a raw file-listing read
  * would have no footer to infer from.
  *
  * Scale notes: a commit's cost is its OWN data plus one metadata file —
  * append never touches existing bytes, rewrite writes the surviving rows
  * once (the same cost the in-place form pays) but keeps the old files
  * for history. Reads list one manifest, not the directory tree (no
  * eventual-consistency listing races). Concurrency: the manifest publish
  * is a rename-if-absent CAS on the version number — concurrent appends
  * stage their (immutable, uniquely-named) data first, then race for
  * v = head+1; exactly one wins, the loser re-reads the new head and
  * retries onto v+1 referencing the same staged files, so no writer ever
  * loses data or clobbers another's version. Retention:
  * [[vacuumKeepingSince]] deletes data files referenced ONLY by dropped
  * manifests, the VACUUM analogue over history, and folds dropped
  * versions' idempotency tokens into a retained side index so
  * [[appendOnce]] stays exactly-once past retention.
  */
object Versioned {

  private def fs(path: String)(implicit spark: SparkSession) =
    Catalog.fsFor(path, spark)

  /** Committed versions, ascending (empty for a table not yet created). */
  def versions(path: String)(implicit spark: SparkSession): Seq[Int] = {
    val f = fs(path)
    val dir = new Path(s"$path/_v")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).toSeq.sorted
  }

  def currentVersion(path: String)(implicit spark: SparkSession): Int =
    versions(path).lastOption.getOrElse(0)

  /** (schema, data files, commit token). Manifest lines: schema DDL,
    * optional `#token=<t>` marker, then one data-file name per line —
    * the token rides IN the manifest so the manifest rename stays the
    * single atomic commit point (a separate marker file would reopen
    * the lost-or-duplicated window a crash between two publishes makes).
    */
  private def manifestInfo(path: String, v: Int)(
      implicit spark: SparkSession): (StructType, Seq[String], Option[String]) = {
    val f = fs(path)
    val p = new Path(s"$path/_v/$v")
    require(f.exists(p),
      s"version $v of $path does not exist (have: ${versions(path).mkString(", ")})")
    val in = f.open(p)
    val txt = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      out.toString("UTF-8")
    } finally in.close()
    val lines = txt.split("\n").toSeq.filter(_.nonEmpty)
    val (tokenLines, fileLines) = lines.tail.partition(_.startsWith("#token="))
    (StructType.fromDDL(lines.head), fileLines,
      tokenLines.headOption.map(_.stripPrefix("#token=")))
  }

  /** Move the staged write's part files into data/ under version-prefixed
    * names and return those names. The staging dir (with its _SUCCESS
    * marker) is removed; the data files themselves are never rewritten.
    */
  private def stageData(path: String, v: Int, df: DataFrame)(
      implicit spark: SparkSession): Seq[String] = {
    val f = fs(path)
    val staging = s"$path/.staging-v$v-" +
      java.util.UUID.randomUUID().toString.take(8)
    df.write.parquet(staging)
    f.mkdirs(new Path(s"$path/data"))
    val moved = f.listStatus(new Path(staging))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val nm = s"c$v-${s.getPath.getName}"
        require(f.rename(s.getPath, new Path(s"$path/data/$nm")),
          s"failed to publish ${s.getPath} as data/$nm")
        nm
      }.toSeq
    f.delete(new Path(staging), true)
    moved
  }

  /** Test seam: invoked immediately before each manifest-publish attempt —
    * lets a spec interleave a concurrent writer deterministically at the
    * CAS point. No-op in production.
    */
  @volatile private[lifecycle] var beforePublish: () => Unit = () => ()

  /** The multi-writer CAS point: publish manifest `v` iff no writer beat
    * us to it. The tmp file is per-attempt unique (two losers can't
    * clobber each other's staging), the existence check rejects a lost
    * race, and the rename is the atomic publish. On HDFS/ABFS the rename
    * itself refuses an existing destination, making the CAS exact; on
    * raw POSIX (rename(2) overwrites) the exists-check narrows the race
    * to the syscall window — an object-store deployment swaps this for
    * its conditional-put primitive, same contract. Returns false when
    * version v was already taken: the caller re-reads the new head and
    * retries onto the next version.
    */
  private def tryPublishManifest(path: String, v: Int, schema: StructType,
      files: Seq[String], token: Option[String])(
      implicit spark: SparkSession): Boolean = {
    val f = fs(path)
    f.mkdirs(new Path(s"$path/_v"))
    val tmp = new Path(s"$path/_v/.$v-" +
      java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    val out = f.create(tmp, true)
    val lines = schema.toDDL +: (token.map("#token=" + _).toSeq ++ files)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    beforePublish()
    val dst = new Path(s"$path/_v/$v")
    if (f.exists(dst)) { f.delete(tmp, false); false }
    else {
      val won = f.rename(tmp, dst)
      if (!won) f.delete(tmp, false)
      won
    }
  }

  private def writeManifest(path: String, v: Int, schema: StructType,
      files: Seq[String], token: Option[String] = None)(
      implicit spark: SparkSession): Unit =
    require(tryPublishManifest(path, v, schema, files, token),
      s"failed to publish manifest $v of $path (version already exists?)")

  /** Commit `df` as an APPEND: version N+1 = version N's files plus the
    * new data. On a not-yet-created table this is the initial commit.
    * Existing bytes are never touched. Returns the new version.
    */
  def append(path: String, df: DataFrame)(
      implicit spark: SparkSession): Int =
    appendTagged(path, df, None)

  /** Manifests record the all-nullable form: nullability flips freely in
    * Spark plans (a lit() column is non-null, the same column read back
    * is nullable) and a non-null contract applied to historical files
    * would be a lie the reader can't check cheaply.
    */
  private def relaxed(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  private def shape(s: StructType): Seq[(String, org.apache.spark.sql.types.DataType)] =
    s.fields.map(f => (f.name, f.dataType)).toSeq

  private def appendTagged(path: String, df: DataFrame,
      token: Option[String])(implicit spark: SparkSession): Int = {
    val f = fs(path)
    // stage ONCE; a lost CAS race re-reads the head and re-publishes a
    // manifest referencing the same already-immutable data files (their
    // c<V>- prefix is provenance, not a reference — the manifest is)
    val staged = stageData(path, currentVersion(path) + 1, df)
    var attempt = 0
    while (attempt < 64) {
      attempt += 1
      // a concurrent SAME-token writer may have won while we staged —
      // re-check inside the loop so exactly one version carries the token
      token.flatMap(knownTokenVersion(path, _)) match {
        case Some(dup) =>
          staged.foreach(n => f.delete(new Path(s"$path/data/$n"), false))
          return dup
        case None =>
      }
      val cur = currentVersion(path)
      val prev = if (cur == 0) Seq.empty else {
        val (prevSchema, prevFiles, _) = manifestInfo(path, cur)
        // an append under a drifted schema would serve HISTORY's files
        // through the new contract — silent NULL-fill or a read error
        // deep in some later query. Rewrite owns schema change (its
        // manifest references only its own output); append must match.
        require(shape(prevSchema) == shape(relaxed(df.schema)),
          s"append schema drift on $path: table is ${prevSchema.toDDL}, " +
            s"append is ${df.schema.toDDL} — commit schema changes as a " +
            "rewrite, which re-publishes every surviving row under the new shape")
        prevFiles
      }
      val v = cur + 1
      if (tryPublishManifest(path, v, relaxed(df.schema),
          prev ++ staged, token))
        return v
      // lost the CAS: someone published v first — loop retries onto v+1
    }
    throw new IllegalStateException(
      s"append to $path lost the manifest CAS 64 times — livelock or a " +
        "writer storm; back off and retry")
  }

  // -------------------------------------------------------------------
  // Token retention (idempotency across VACUUM): `#token=` markers live
  // in manifests, so dropping a manifest would forget its batch token
  // and a delayed at-least-once replay of that batch would re-append as
  // a duplicate version. Vacuum therefore folds dropped tokens into a
  // retained side index `_v/.tokens-<seq>` (lines `<version> <token>`);
  // each vacuum publishes a NEW index (atomic fresh-name rename, never
  // an in-place overwrite) carrying the previous index's entries plus
  // the newly dropped ones, and deletes older indexes only afterwards —
  // a crash at any point leaves at least one complete index readable.
  // -------------------------------------------------------------------
  private def tokenIndexFiles(path: String)(
      implicit spark: SparkSession): Seq[(Long, Path)] = {
    val f = fs(path)
    val dir = new Path(s"$path/_v")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(".tokens-"))
      .flatMap { p =>
        p.getName.stripPrefix(".tokens-").toLongOption.map(_ -> p)
      }.toSeq.sortBy(_._1)
  }

  /** Vacuum-retained token → version map (newest complete index). */
  private def retainedTokens(path: String)(
      implicit spark: SparkSession): Map[String, Int] =
    tokenIndexFiles(path).lastOption.map { case (_, p) =>
      val in = fs(path).open(p)
      val txt = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        out.toString("UTF-8")
      } finally in.close()
      txt.split("\n").filter(_.nonEmpty).map { line =>
        val Array(v, t) = line.split(" ", 2)
        t -> v.toInt
      }.toMap
    }.getOrElse(Map.empty)

  /** The version that committed `token`, live manifests checked newest-
    * first (a replay almost always hits within the last few), then the
    * vacuum-retained index for tokens whose manifests history dropped.
    */
  private def knownTokenVersion(path: String, token: String)(
      implicit spark: SparkSession): Option[Int] =
    versions(path).reverse
      .find(v => manifestInfo(path, v)._3.contains(token))
      .orElse(retainedTokens(path).get(token))

  /** IDEMPOTENT append keyed by a caller token (a streaming batch id):
    * if any committed version already carries `token` — or the vacuum-
    * retained token index records it for a version history has since
    * dropped — the call is a no-op returning that version, so
    * at-least-once redelivery publishes exactly one version per batch,
    * across the table's whole lifetime, not just the retention window.
    * The token lives inside the manifest (one atomic publish; no second
    * marker file to crash between).
    */
  def appendOnce(path: String, df: DataFrame, token: String)(
      implicit spark: SparkSession): Int =
    knownTokenVersion(path, token)
      .getOrElse(appendTagged(path, df, Some(token)))

  /** Commit a full REWRITE (DELETE/UPDATE compaction shape): version N+1
    * references only the transform's output; version N's files remain on
    * disk serving history until vacuumed. Returns the new version.
    */
  def rewrite(path: String)(f: DataFrame => DataFrame)(
      implicit spark: SparkSession): Int = {
    val cur = currentVersion(path)
    require(cur > 0, s"cannot rewrite $path: no committed version")
    val out = f(readVersion(path, cur))
    val v = cur + 1
    writeManifest(path, v, relaxed(out.schema), stageData(path, v, out))
    v
  }

  /** Time travel: the table exactly as committed at version `v`. */
  def readVersion(path: String, v: Int)(
      implicit spark: SparkSession): DataFrame = {
    val (schema, files, _) = manifestInfo(path, v)
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema)
      .parquet(files.map(n => s"$path/data/$n"): _*)
  }

  def readLatest(path: String)(implicit spark: SparkSession): DataFrame =
    readVersion(path, currentVersion(path))

  /** Retention: drop manifests OLDER than `keepSince` and delete every
    * data file no surviving manifest references. Returns the number of
    * data files deleted. Versions ≥ keepSince stay fully readable, and
    * dropped versions' `#token=` idempotency markers are folded into the
    * retained token index FIRST, so [[appendOnce]]'s exactly-once
    * contract survives retention (a delayed replay of a vacuumed batch
    * stays a no-op instead of re-appending as a duplicate version).
    */
  def vacuumKeepingSince(path: String, keepSince: Int)(
      implicit spark: SparkSession): Int = {
    val f = fs(path)
    val (drop, keep) = versions(path).partition(_ < keepSince)
    require(keep.nonEmpty,
      s"refusing to vacuum every version of $path (keepSince=$keepSince)")
    // 1) retain dropped tokens: new index = previous index ∪ dropped
    //    manifests' tokens, published under a FRESH sequence number
    //    before anything is deleted (idempotent under crash-rerun)
    val droppedTokens = drop.flatMap(v =>
      manifestInfo(path, v)._3.map(t => t -> v)).toMap
    val oldIndexes = tokenIndexFiles(path)
    if (droppedTokens.nonEmpty) {
      val merged = retainedTokens(path) ++ droppedTokens
      val seq = oldIndexes.lastOption.map(_._1 + 1).getOrElse(1L)
      val tmp = new Path(s"$path/_v/..tokens-$seq.tmp")
      val out = f.create(tmp, true)
      try out.write(merged.map { case (t, v) => s"$v $t" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      require(f.rename(tmp, new Path(s"$path/_v/.tokens-$seq")),
        s"failed to publish token index $seq of $path")
    }
    // 2) delete dead data, dropped manifests, then superseded indexes
    val live = keep.flatMap(manifestInfo(path, _)._2).toSet
    val dead = drop.flatMap(manifestInfo(path, _)._2).toSet -- live
    dead.foreach(n => f.delete(new Path(s"$path/data/$n"), false))
    drop.foreach(v => f.delete(new Path(s"$path/_v/$v"), false))
    if (droppedTokens.nonEmpty)
      oldIndexes.foreach { case (_, p) => f.delete(p, false) }
    dead.size
  }

  // ---------------------------------------------------------------------
  // Gate query: seed from the fixture, append a delta, rewrite-delete a
  // type, then read EVERY version back — per-version accounting proves
  // each snapshot stayed exactly what it was when committed (v1 must not
  // see the delta; v2 must still hold the rows v3 deleted).
  // ---------------------------------------------------------------------
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = graft.Scratch.freshRunDir(spark, "versioned_run", dir) + "/events_v"
    val base = Catalog.events(spark, dir)
      .select(col("event_id"), col("event_type"))
    append(t, base)
    append(t, base.filter(col("event_id") % 10 === 3)
      .select((col("event_id") + 10000000L).as("event_id"), col("event_type")))
    rewrite(t)(_.filter(col("event_type") =!= "error"))
    versions(t).map { v =>
      readVersion(t, v).agg(
        lit(v).cast("long").as("version"),
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("event_id")).as("sum_id"))
    }.reduce(_.unionByName(_)).orderBy(col("version"))
  }

  val timeTravelSql: String =
    """WITH base AS (SELECT event_id, event_type FROM events),
      |delta AS (SELECT event_id + 10000000 AS event_id, event_type
      | FROM events WHERE event_id % 10 = 3),
      |v2src AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
      |SELECT 1::BIGINT AS version, count(*)::BIGINT AS n_rows,
      | CAST(sum(event_id) AS BIGINT) AS sum_id FROM base
      |UNION ALL SELECT 2, count(*), CAST(sum(event_id) AS BIGINT) FROM v2src
      |UNION ALL SELECT 3, count(*), CAST(sum(event_id) AS BIGINT)
      | FROM v2src WHERE event_type <> 'error'
      |ORDER BY version""".stripMargin.replace('\n', ' ')

  val all: Seq[graft.operators.Q] = Seq(
    graft.operators.Q("s24_time_travel", timeTravel, Some(timeTravelSql),
      "versioned table commits + time-travel reads (the Iceberg/Delta snapshot pattern minimally): append never touches published bytes, rewrite keeps old files serving history, each version is ONE manifest read; gate reads every version back and proves snapshot isolation against the arithmetic oracle"))
}
