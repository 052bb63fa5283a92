package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** saltedJoin: identical rows to the plain equi-join on a skewed fixture,
  * planned as a shuffled hash join on (key, salt) — never a broadcast.
  */
class SaltedJoinSpec extends SparkSuite {

  test("salted join equals the plain join on a hot-key fixture, incl. NULL keys") {
    import spark.implicits._
    // one hot key (0) carrying 90% of the fact rows, plus NULL fact keys
    // (inner-join semantics: dropped by both forms) and a dim key with no
    // fact rows (4)
    val fact = ((0L until 900L).map(i => (i, Some(0L))) ++
      (900L until 1000L).map(i => (i, Some(i % 4))) ++
      Seq((1000L, None), (1001L, None)))
      .toDF("row_id", "k").repartition(7)
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused"))
      .toDF("dk", "name")

    val salted = Relational.saltedJoin(fact, dim, col("k"), col("dk"),
      col("row_id"), salts = 8)
    val plain = fact.join(dim, col("k") === col("dk"))

    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select("row_id", "k", "dk", "name").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 1000) // 900 hot + 100 keys 0-3, NULLs dropped
  }

  test("persisted stats derive the salt fan-out, and the derived-R join is exact") {
    import spark.implicits._
    import graft.lifecycle.Stats
    import graft.operators.Relational.{saltsFor, saltsForTable, JoinSalts}
    // skewed fact: key 0 owns 925 of 1000 rows (900 direct + the i%4==0
    // quarter of the tail) — written + ANALYZEd the
    // way a deployment's pipeline would maintain it
    val fact = ((0L until 900L).map(i => (i, 0L)) ++
      (900L until 1000L).map(i => (i, i % 4)))
      .toDF("row_id", "k").repartition(7)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_salt_stats_").toString
    val p = s"$scratch/fact"
    fact.write.parquet(p)
    Stats.analyze(spark, p)
    // the stats recorded the hot key's exact mass
    assert(Stats.hotKeyRows(spark, p, "k").contains(925L))
    // formula: R covers the hot key in per-task-budget slices, floors at
    // 1 (no key outgrows a task → salting is pure overhead), caps at 1024
    assert(saltsFor(925L, perTaskBudget = 100L) == 10)
    assert(saltsFor(925L) == 1, "fixture-sized hot key fits one task")
    assert(saltsFor(0L, 100L) == 1 && saltsFor(-1L, 100L) == 1)
    assert(saltsFor(Long.MaxValue, 100L) == 1024)
    // stats-driven: a 100-row task budget derives R=10 from the table,
    // an unanalyzed path falls back to the gate default
    val derived = saltsForTable(spark, p, "k", perTaskBudget = 100L)
    assert(derived == 10, s"expected stats-derived R=10, got $derived")
    assert(saltsForTable(spark, s"$scratch/never_analyzed", "k",
      perTaskBudget = 100L) == JoinSalts)
    // the cheap ANALYZE form (withHotKeys=false) writes NULL, not 0 —
    // consumers must fall back to the default, not derive R=1
    val p2 = s"$scratch/fact_cheap"
    fact.write.parquet(p2)
    Stats.analyze(spark, p2, withHotKeys = false)
    assert(Stats.hotKeyRows(spark, p2, "k").isEmpty)
    assert(saltsForTable(spark, p2, "k", perTaskBudget = 100L) == JoinSalts)
    // and the join at the DERIVED fan-out is still exactly the plain join
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("dk", "name")
    val factBack = spark.read.parquet(p)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select("row_id", "k", "dk", "name").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(Relational.saltedJoin(factBack, dim, col("k"), col("dk"),
        col("row_id"), salts = derived))
      == canon(factBack.join(dim, col("k") === col("dk"))))
  }

  test("the salted plan is a shuffled hash join keyed on (key, salt)") {
    import spark.implicits._
    val fact = (0L until 100L).map(i => (i, i % 3)).toDF("row_id", "k")
    val dim = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("dk", "name")
    val plan = Relational.saltedJoin(fact, dim, col("k"), col("dk"),
      col("row_id"), salts = 4).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salting exists to avoid the broadcast/hot-reducer plan:\n$plan")
    assert(plan.contains("graft_fact_salt"),
      s"join key must include the salt:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim must not broadcast:\n$plan")
  }
}
