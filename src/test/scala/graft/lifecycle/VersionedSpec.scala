package graft.lifecycle

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Versioned-table semantics (s24): snapshot isolation across commits,
  * empty-version readability, retention vacuum, and the error contract.
  */
class VersionedSpec extends SparkSuite {

  import spark.implicits._
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private def freshTable(): String =
    Files.createTempDirectory("graft-versioned").toString + "/t"

  test("append and rewrite commit isolated snapshots; history stays readable") {
    val t = freshTable()
    assert(Versioned.versions(t).isEmpty && Versioned.currentVersion(t) == 0)
    Versioned.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Versioned.append(t, Seq((3L, "c")).toDF("id", "v"))
    Versioned.rewrite(t)(_.filter(col("id") =!= 2L))
    assert(Versioned.versions(t) == Seq(1, 2, 3))
    def ids(v: Int) = Versioned.readVersion(t, v).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == Seq(1L, 2L), "v1 must not see later commits")
    assert(ids(2) == Seq(1L, 2L, 3L))
    assert(ids(3) == Seq(1L, 3L), "the rewrite deleted id 2")
    assert(Versioned.readLatest(t).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("a rewrite that filters everything out stays a readable empty version") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))
    Versioned.rewrite(t)(_.filter(lit(false)))
    val empty = Versioned.readVersion(t, 2)
    assert(empty.collect().isEmpty)
    // the schema survives through the manifest (no data file to infer from)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "v"))
    // and the table remains appendable past the empty version
    Versioned.append(t, Seq((9L, "z")).toDF("id", "v"))
    assert(Versioned.readLatest(t).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("vacuum drops only files no kept manifest references") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))      // v1: file A
    Versioned.append(t, Seq((2L, "b")).toDF("id", "v"))      // v2: A + B
    Versioned.rewrite(t)(_.filter(col("id") === 2L))         // v3: file C only
    val deleted = Versioned.vacuumKeepingSince(t, 3)
    assert(deleted > 0, "v1/v2-only files must be reclaimed")
    assert(Versioned.versions(t) == Seq(3))
    // the kept version is untouched
    assert(Versioned.readVersion(t, 3).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a dropped version now fails with the available-versions diagnostic
    val e = intercept[IllegalArgumentException](Versioned.readVersion(t, 1))
    assert(e.getMessage.contains("version 1") && e.getMessage.contains("have: 3"))
    // refusing to vacuum away ALL history
    intercept[IllegalArgumentException](Versioned.vacuumKeepingSince(t, 99))
  }

  test("append refuses schema drift; rewrite is the sanctioned schema change") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))
    // a drifted append would serve v1's files through the new contract
    val e = intercept[IllegalArgumentException] {
      Versioned.append(t, Seq((2L, "b", 9L)).toDF("id", "v", "extra"))
    }
    assert(e.getMessage.contains("schema drift"))
    assert(Versioned.versions(t) == Seq(1), "the refused commit left no version")
    // nullability alone is NOT drift (it flips freely in Spark plans)
    Versioned.append(t, Seq((2L, "b")).toDF("id", "v")
      .select(col("id"), lit("const").as("v")))
    assert(Versioned.versions(t) == Seq(1, 2))
    // rewrite re-publishes every surviving row, so it MAY change shape
    Versioned.rewrite(t)(_.withColumn("extra", lit(1L)))
    val evolved = Versioned.readVersion(t, 3)
    assert(evolved.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    // and history still reads under ITS OWN schema
    assert(Versioned.readVersion(t, 1).schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("appendOnce is exactly-once per token under redelivery") {
    val t = freshTable()
    val v1 = Versioned.appendOnce(t, Seq((1L, "a")).toDF("id", "v"), "batch-0")
    // redelivery of the same batch: no new version, same version returned,
    // data not duplicated
    val v1again = Versioned.appendOnce(t, Seq((1L, "a")).toDF("id", "v"), "batch-0")
    assert(v1 == 1 && v1again == 1 && Versioned.versions(t) == Seq(1))
    assert(Versioned.readLatest(t).count() == 1L)
    // a NEW token commits normally
    val v2 = Versioned.appendOnce(t, Seq((2L, "b")).toDF("id", "v"), "batch-1")
    assert(v2 == 2 && Versioned.readLatest(t).count() == 2L)
    // tokens survive an interleaved untagged commit
    Versioned.append(t, Seq((3L, "c")).toDF("id", "v"))
    assert(Versioned.appendOnce(t, Seq((2L, "b")).toDF("id", "v"), "batch-1") == 2)
    assert(Versioned.versions(t) == Seq(1, 2, 3))
  }

  test("appendOnce stays a no-op after vacuum drops the token's manifest") {
    val t = freshTable()
    val v1 = Versioned.appendOnce(t, Seq((1L, "a")).toDF("id", "v"), "batch-0")
    Versioned.appendOnce(t, Seq((2L, "b")).toDF("id", "v"), "batch-1")
    Versioned.rewrite(t)(_.filter(col("id") === 2L))          // v3
    // retention drops v1/v2 — along with the manifests that carried the
    // #token= markers; the retained index must keep honoring them
    Versioned.vacuumKeepingSince(t, 3)
    assert(Versioned.versions(t) == Seq(3))
    val replay = Versioned.appendOnce(t, Seq((1L, "a")).toDF("id", "v"), "batch-0")
    assert(replay == v1, s"vacuumed token must replay as its version, got v$replay")
    assert(Versioned.versions(t) == Seq(3),
      "a replayed vacuumed batch must not re-append as a duplicate version")
    assert(Versioned.readLatest(t).count() == 1L)
    // a SECOND vacuum folds the previous index forward (union, not replace)
    Versioned.appendOnce(t, Seq((3L, "c")).toDF("id", "v"), "batch-2") // v4
    Versioned.append(t, Seq((4L, "d")).toDF("id", "v"))                // v5
    Versioned.vacuumKeepingSince(t, 5)
    assert(Versioned.appendOnce(t, Seq((1L, "a")).toDF("id", "v"), "batch-0") == 1)
    assert(Versioned.appendOnce(t, Seq((3L, "c")).toDF("id", "v"), "batch-2") == 4)
    assert(Versioned.versions(t) == Seq(5))
  }

  test("two interleaved writers: exactly one wins v(N+1), the loser retries onto v(N+2)") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))       // v1 = head
    // writer A reaches its CAS point for v2; writer B commits v2 first;
    // A must detect the taken version and retry onto v3 — with no rows
    // lost from either writer
    var interleaved = false
    Versioned.beforePublish = () => {
      if (!interleaved) {
        interleaved = true      // B publishes inside A's attempt, once
        Versioned.append(t, Seq((2L, "writer-B")).toDF("id", "v"))
      }
    }
    try {
      val vA = Versioned.append(t, Seq((3L, "writer-A")).toDF("id", "v"))
      assert(vA == 3, s"the loser must land on v3, got v$vA")
    } finally Versioned.beforePublish = () => ()
    assert(Versioned.versions(t) == Seq(1, 2, 3))
    assert(Versioned.readVersion(t, 2).collect().map(_.getString(1)).sorted
      .toSeq == Seq("a", "writer-B"), "B's v2 is exactly B's commit")
    assert(Versioned.readLatest(t).collect().map(_.getString(1)).sorted
      .toSeq == Seq("a", "writer-A", "writer-B"),
      "the retried publish references A's staged files — nothing lost")
  }

  test("interleaved SAME-token writers: the loser detects the duplicate and no-ops") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))       // v1
    var interleaved = false
    Versioned.beforePublish = () => {
      if (!interleaved) {
        interleaved = true
        Versioned.appendOnce(t, Seq((2L, "B")).toDF("id", "v"), "batch-X")
      }
    }
    try {
      val v = Versioned.appendOnce(t, Seq((2L, "B")).toDF("id", "v"), "batch-X")
      assert(v == 2, s"the replayed token must resolve to B's v2, got v$v")
    } finally Versioned.beforePublish = () => ()
    assert(Versioned.versions(t) == Seq(1, 2),
      "the same batch must not commit twice under a race")
    assert(Versioned.readLatest(t).count() == 2L)
  }

  test("what changed between versions: u1's diff composes over two snapshot reads") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "txt"))
    // v2: 2 revised, 3 added; 1 untouched
    Versioned.rewrite(t)(_ => Seq((1L, "a"), (2L, "B2"), (3L, "c"))
      .toDF("id", "txt"))
    val d = graft.operators.Diff.diffByKey(
        Versioned.readVersion(t, 1), Versioned.readVersion(t, 2),
        "id", org.apache.spark.sql.functions.col("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("status")))
      .toMap
    assert(d == Map(2L -> "changed", 3L -> "added"),
      s"version-to-version diff must name exactly the delta: $d")
  }

  test("reading an uncommitted version names what exists") {
    val t = freshTable()
    Versioned.append(t, Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](Versioned.readVersion(t, 7))
    assert(e.getMessage.contains("version 7") && e.getMessage.contains("have: 1"))
  }
}
