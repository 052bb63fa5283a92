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

  /** Round-11 verdict item #9: pin the AQE-vs-salting interplay, as
    * MEASURED (the first draft of this test assumed AQE would see the
    * salted shuffle as flat under any threshold — the finalized plans
    * say otherwise, and the test now asserts what actually happens).
    *
    * AQE's OptimizeSkewedJoin acts on shuffle PARTITION BYTES, after
    * the salt has already spread the hot key. Three pinned facts:
    *  1. Control: with thresholds forced tiny, the UNSALTED shuffle
    *     join is skew-split — the conditions bite.
    *  2. Under those same tiny thresholds the SALTED join is split
    *     FURTHER (`skew=true` on the SHJ): AQE and the salt COMPOSE —
    *     the join keys keep the salt, the build side replicates per
    *     split, and the rows are exactly the plain join's. "Double
    *     mitigation" is therefore benign in semantics and, at real
    *     thresholds, absent in practice (fact 3).
    *  3. At the DEFAULT 256 MB threshold (the deployment setting), the
    *     salted join's partitions — sized by [[Relational.saltsFor]]'s
    *     ~1M-row task budget, i.e. tens of MB — sit far below the
    *     trigger and AQE leaves them alone: no skew markers. The salt
    *     budget being ~10× under AQE's default threshold is the design
    *     margin that keeps the two mechanisms from re-splitting each
    *     other's work.
    */
  test("AQE skew-join composes with the manual salt: splits further only " +
      "under forced-tiny thresholds, no-ops at deployment thresholds") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption)

    // hot key 0 owns 90% of 20k fact rows — real shuffle-partition skew
    val fact = ((0L until 18000L).map(i => (i, 0L)) ++
      (18000L until 20000L).map(i => (i, i % 7)))
      .toDF("row_id", "k").repartition(13)
    val dim = (0L until 7L).map(i => (i, s"d$i")).toDF("dk", "name")
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select("row_id", "k", "dk", "name").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    val expected = canon(fact.join(dim, col("k") === col("dk")))

    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // materialize THIS execution so AQE finalizes
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"plan not finalized:\n$p")
      p
    }

    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // ---- arms 1+2: thresholds forced tiny so AQE acts at fixture scale
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")

      val unsaltedPlan = finalPlan(
        fact.join(dim.hint("shuffle_hash"), col("k") === col("dk")))
      assert(unsaltedPlan.contains("skewed"),
        s"control arm: AQE should skew-split the unsalted hot partition " +
          s"under tiny thresholds:\n$unsaltedPlan")

      val saltedTiny = Relational.saltedJoin(fact, dim, col("k"), col("dk"),
        col("row_id"), salts = 8)
      val saltedTinyPlan = finalPlan(saltedTiny)
      assert(saltedTinyPlan.contains("ShuffledHashJoin"),
        s"salt must keep the shuffled hash join under AQE:\n$saltedTinyPlan")
      assert(saltedTinyPlan.contains("graft_fact_salt"),
        s"AQE must not strip the salt from the join key:\n$saltedTinyPlan")
      // MEASURED: AQE splits the salted partitions further when told 2 KB
      // is oversized — and that composition is row-exact
      assert(saltedTinyPlan.contains("skew=true"),
        s"expected AQE to further split under forced-tiny thresholds " +
          s"(the measured composition):\n$saltedTinyPlan")
      assert(canon(saltedTiny) == expected,
        "AQE skew-splitting a salted SHJ must not change rows")

      // ---- arm 3: deployment thresholds (Spark defaults) — AQE no-ops
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      val saltedReal = Relational.saltedJoin(fact, dim, col("k"), col("dk"),
        col("row_id"), salts = 8)
      val saltedRealPlan = finalPlan(saltedReal)
      assert(saltedRealPlan.contains("ShuffledHashJoin") &&
        saltedRealPlan.contains("graft_fact_salt"))
      assert(!saltedRealPlan.contains("skewed") &&
        !saltedRealPlan.contains("skew=true"),
        s"at default thresholds the salt-budgeted partitions are far " +
          s"below AQE's trigger — no double mitigation:\n$saltedRealPlan")
      assert(canon(saltedReal) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
