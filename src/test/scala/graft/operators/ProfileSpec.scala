package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Column-profile semantics on a hand-built table: null accounting, exact
  * NDV, type-stable min/max rendering, and the HLL deployment form.
  */
class ProfileSpec extends SparkSuite {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("b"), Some(1.005), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (2L, None, Some(2.0), None),
    (3L, Some("a"), None, Some(Timestamp.valueOf("2024-02-03 00:00:00"))),
    (3L, Some("a"), Some(10.5), None))
    .toDF("id", "s", "d", "t")

  private def rowFor(name: String) =
    Profile.profileOf(df).collect()
      .map(r => r.getString(0) -> r).toMap.apply(name)

  test("c6 DQ suite: hand-computed verdicts, boundary ppm, NULLs, empty table") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 10 rows, 2 violations of "x <= 5" → 200000 ppm: exactly AT a
    // 200000 budget passes (<=), and a 199999 budget fails; NULL x is
    // not a range violation (NULL-safe predicate contract), only a
    // not-null violation
    val df = (Seq.fill(7)(Some(1.0)) ++ Seq(Some(9.0), Some(9.0), None))
      .toDF("x")
    val got = Profile.dqSuiteOf(df, Seq(
      Profile.DqRule("at_budget", col("x") > 5, 200000L),
      Profile.DqRule("under_budget", col("x") > 5, 199999L),
      Profile.DqRule("not_null", col("x").isNull, 0L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("at_budget") == ((10L, 2L, 200000L, true)), s"got $got")
    assert(got("under_budget") == ((10L, 2L, 200000L, false)), s"got $got")
    assert(got("not_null") == ((10L, 1L, 100000L, false)), s"got $got")
    // empty table: every rule passes vacuously, ppm NULL
    val e = Profile.dqSuiteOf(Seq.empty[Double].toDF("x"),
      Seq(Profile.DqRule("r", col("x") > 5, 0L))).collect().head
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L &&
      e.isNullAt(4) && e.getBoolean(5), s"got $e")
  }

  test("c5 referential integrity: orphans both ways, NULL keys, empty table") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // docs {1,2,3,NULL}; vecs {2,3,4}: matched {2,3} → docs_unembedded 2
    // (1 and the NULL-keyed row), vecs_orphaned 1 (4); coverage 2/4 = 50%
    val docs = Seq(Some(1L), Some(2L), Some(3L), None).toDF("doc_id")
    val vecs = Seq(2L, 3L, 4L).toDF("vec_id")
    val r = Profile.referentialIntegrityOf(docs, vecs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((4L, 3L, 2L, 2L, 1L, 500000L)), s"got $r")
    // an empty document table: coverage of nothing is NULL, not 0 or a crash
    val e = Profile.referentialIntegrityOf(
      Seq.empty[Long].toDF("doc_id"), vecs).collect().head
    assert(e.getLong(0) == 0L && e.getLong(4) == 3L && e.isNullAt(5), s"got $e")
  }

  test("rows, nulls, and exact distinct count per column") {
    val s = rowFor("s")
    assert(s.getLong(1) == 4 && s.getLong(2) == 1 && s.getLong(3) == 2)
    val id = rowFor("id")
    assert(id.getLong(2) == 0 && id.getLong(3) == 3)
  }

  test("min/max render type-stably: ints plain, doubles 2-dp, timestamps formatted") {
    assert(rowFor("id").getString(4) == "1" && rowFor("id").getString(5) == "3")
    assert(rowFor("s").getString(4) == "a" && rowFor("s").getString(5) == "b")
    // doubles round through DECIMAL(18,2): 1.005 -> "1.01" (half-up), 10.5 -> "10.50"
    assert(rowFor("d").getString(4) == "1.01" && rowFor("d").getString(5) == "10.50")
    assert(rowFor("t").getString(4) == "2024-01-02 03:04:05")
    assert(rowFor("t").getString(5) == "2024-02-03 00:00:00")
  }

  test("an all-NULL column profiles as nulls=n, ndv=0, min/max NULL") {
    val d = df.withColumn("allnull", lit(null).cast("string"))
    val r = Profile.profileOf(d).collect()
      .map(r => r.getString(0) -> r).toMap.apply("allnull")
    assert(r.getLong(2) == 4 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("c2 judges every column's HLL estimate inside the band on the fixture") {
    val rows = Profile.columnProfileApprox(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      s"HLL estimate outside its error band: ${rows.mkString(", ")}")
    // the exact column is c1's n_distinct for the same columns
    val c1 = Profile.columnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == c1)
  }

  test("the approx (HLL) deployment form keeps the same shape, no Expand") {
    val approx = Profile.profileOf(df, approx_count_distinct(_))
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL is exact at these cardinalities
    assert(rows("id") == 3 && rows("s") == 2)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "the HLL form must not pay the multi-distinct Expand")
    assert(Profile.profileOf(df).queryExecution.executedPlan.toString
      .contains("Expand"), "exact NDV is expected to plan via Expand")
  }

  test("c3 corrOf: known correlations, pairwise-complete null handling") {
    // y = 2x (perfect +), z = -x (perfect -), w decorrelated by a null
    val d = Seq(
      (1.0, 2.0, Some(-1.0), Some(5.0)),
      (2.0, 4.0, Some(-2.0), None),
      (3.0, 6.0, Some(-3.0), Some(1.0)),
      (4.0, 8.0, None, Some(3.0)))
      .toDF("x", "y", "z", "w")
    val rows = Profile.corrOf(d, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = rows(("x", "y"))
    assert(xy.getLong(2) == 4 && math.abs(xy.getDouble(3) - 1.0) < 1e-12)
    val xz = rows(("x", "z"))
    // z's null row drops from the x-z pair only (pairwise-complete)
    assert(xz.getLong(2) == 3 && math.abs(xz.getDouble(3) + 1.0) < 1e-12)
    val xw = rows(("x", "w"))
    assert(xw.getLong(2) == 3 && math.abs(xw.getDouble(3)) < 1.0)
    assert(rows.size == 6)
  }

  test("c3 gate query: 6 pairs over lineitem, all finite in [-1, 1]") {
    val rows = Profile.numericCorr(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall { r =>
      val c = r.getDouble(3); !c.isNaN && math.abs(c) <= 1.0
    })
    // the plan is one aggregate over one scan — no join, no Expand
    val plan = Profile.numericCorr(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Expand"))
  }

  test("c4 chi-square: perfect association, independence, zero cells, NULLs") {
    import spark.implicits._
    // perfect 2×2 association: 10×(a,p) + 10×(b,q). χ² = n = 20 — and
    // HALF that mass sits in the two ZERO cells ((0−E)²/E = E = 5 each),
    // so this also pins the grid densification
    val perfect = (Seq.fill(10)(("a", "p")) ++ Seq.fill(10)(("b", "q")))
      .toDF("lang", "source")
    val p = Profile.chiSquareOf(perfect, "lang", "source").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3), p.getLong(4))
      == ((20L, 2L, 2L, 1L, 20000000L)), s"got $p")
    // exact independence: every (x, y) cell = r·c/n ⇒ χ² = 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq("p", "q", "s") }
      yield Seq.fill(if (x == "a") 2 else 4)((x, y))).flatten
      .toDF("lang", "source")
    val i = Profile.chiSquareOf(indep, "lang", "source").collect().head
    assert((i.getLong(3), i.getLong(4)) == ((2L, 0L)), s"got $i")
    // NULL on either side drops the row from n entirely
    val withNulls = perfect.union(
      Seq((null.asInstanceOf[String], "p"), ("a", null.asInstanceOf[String]))
        .toDF("lang", "source"))
    val w = Profile.chiSquareOf(withNulls, "lang", "source").collect().head
    assert(w.getLong(0) == 20L && w.getLong(4) == 20000000L)
  }

  test("c7 filterAucOf: perfect, inverted, tied, and hand-computed rankings") {
    def auc(rows: Seq[(String, Long, Boolean)]): Map[String, Option[Long]] =
      Profile.filterAucOf(rows.toDF("slice", "score", "label")).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // perfect separator: every positive out-scores every negative
    assert(auc(Seq(("s", 1L, false), ("s", 2L, false), ("s", 3L, true),
      ("s", 9L, true)))("s").contains(1000000L))
    // inverted ranking: AUC 0
    assert(auc(Seq(("s", 9L, false), ("s", 1L, true)))("s").contains(0L))
    // all tied: AUC exactly 1/2 via the average-rank tie rule
    assert(auc(Seq(("s", 5L, true), ("s", 5L, false)))("s").contains(500000L))
    // hand-computed mix: pos {3, 5}, neg {1, 5} — pairs win/loss/win/tie
    // = 2.5 of 4 → 625000 ppm
    assert(auc(Seq(("s", 3L, true), ("s", 5L, true), ("s", 1L, false),
      ("s", 5L, false)))("s").contains(625000L))
    // a single-class slice has no ranking to grade: NULL, not 0 or 1;
    // and slices evaluate independently
    val m = auc(Seq(("only_pos", 7L, true), ("only_pos", 8L, true),
      ("both", 2L, true), ("both", 1L, false)))
    assert(m("only_pos").isEmpty)
    assert(m("both").contains(1000000L))
  }

  test("c8 k-anonymity: hand-computed exposure, NULL-as-class, vacuous empty pass") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // classes of sizes 1, 2, 5 at k=3: two small classes expose 3 of 8
    // rows -> 375000 ppm
    val df = (Seq(("a", "x")) ++ Seq.fill(2)(("b", "x")) ++
      Seq.fill(5)(("c", "y"))).toDF("q1", "q2")
    val r = Profile.kAnonymityOf(df, Seq("q1", "q2"), 3L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ==
      ((8L, 3L, 2L, 3L)))
    assert(r.getLong(5) == 375000L && !r.getBoolean(6))
    // a k-anonymous table passes with zero exposure
    val ok = Profile.kAnonymityOf(
      Seq.fill(4)(("a", "x")).toDF("q1", "q2"), Seq("q1"), 3L).collect().head
    assert(ok.getBoolean(6) && ok.getLong(4) == 0L)
    // NULL quasi-identifiers form their OWN class (a NULL is identifying)
    val schema = StructType(Seq(StructField("q1", StringType, nullable = true)))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null), Row(null), Row("v"))),
      schema)
    val nr = Profile.kAnonymityOf(withNull, Seq("q1"), 2L).collect().head
    assert(nr.getLong(1) == 2L, "NULL must group as one class")
    assert(nr.getLong(4) == 1L, "only the singleton 'v' class is small")
    // empty table: vacuous pass, NULL ppm
    val er = Profile.kAnonymityOf(
      withNull.filter(lit(false)), Seq("q1"), 2L).collect().head
    assert(er.getLong(0) == 0L && er.getBoolean(6) && er.isNullAt(5))
  }

  test("c10 storage profile sums footers across files; n_values reconcile with rows") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("c10").toString + "/t"
    (1L to 300L).map(i => (i, s"row $i", i % 7))
      .toDF("id", "txt", "grp")
      .repartition(3).write.parquet(d) // multi-file: the sum must span files
    val got = Profile.storageProfileOf(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set("id", "txt", "grp"), s"got ${got.keySet}")
    got.foreach { case (c, (n, comp, uncomp)) =>
      assert(n == 300L, s"$c n_values $n != rows")
      assert(comp > 0L && uncomp > 0L, s"$c zero byte accounting")
    }
    // the wide string column must own more bytes than the modular long
    assert(got("txt")._3 > got("grp")._3, "txt should dominate uncompressed")
  }

  test("c9 l-diversity: homogeneous class fails where c8 passes; hand-computed exposure") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // class A: 4 rows, ALL sensitive=s1 (k-anonymous at k=3, diversity 1)
    // class B: 3 rows, sensitive s1/s2/s3 (diverse)
    val df = (Seq.fill(4)(("A", "s1")) ++ Seq(("B", "s1"), ("B", "s2"), ("B", "s3")))
      .toDF("q1", "sens")
    // the selling point: c8 passes this table, c9 flags class A
    val kr = Profile.kAnonymityOf(df, Seq("q1"), 3L).collect().head
    assert(kr.getBoolean(6), "fixture must be k-anonymous or the contrast is lost")
    val r = Profile.lDiversityOf(df, Seq("q1"), col("sens"), 3L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((7L, 2L, 1L, 1L, 4L)))
    assert(r.getLong(6) == 4L * 1000000L / 7L && !r.getBoolean(7))
    // NULL is a sensitive value like any other: {s1, NULL} has diversity 2
    val schema = StructType(Seq(
      StructField("q1", StringType, nullable = true),
      StructField("sens", StringType, nullable = true)))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("A", "s1"), Row("A", null))), schema)
    val nr = Profile.lDiversityOf(withNull, Seq("q1"), col("sens"), 2L).collect().head
    assert(nr.getLong(3) == 2L && nr.getBoolean(7), "NULL must count as a value")
    // empty table: vacuous pass, NULL ppm, min_diversity 0
    val er = Profile.lDiversityOf(
      withNull.filter(lit(false)), Seq("q1"), col("sens"), 2L).collect().head
    assert(er.getLong(0) == 0L && er.getLong(3) == 0L &&
      er.getBoolean(7) && er.isNullAt(6))
  }

  test("c7 gate query: per-lang rows, counts reconcile, ppm in range") {
    val rows = Profile.filterAuc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // slices together account for every non-NULL-text document
    val total = graft.Catalog.documents(spark, sfDir)
      .filter(col("text").isNotNull).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val ppm = r.getLong(3)
      assert(ppm >= 0L && ppm <= 1000000L, s"${r.getString(0)}: $ppm")
    }
  }

  test("c4 gate query: single accounting row, dof consistent, fixture-bound") {
    val r = Profile.chiSquare(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) > 0 && row.getLong(4) >= 0)
    assert(row.getLong(3) == (row.getLong(1) - 1) * (row.getLong(2) - 1))
  }

  // ---------------------------------------------------------------------
  // c11 — inclusion-dependency discovery
  // ---------------------------------------------------------------------

  test("c11 hand tables: containment arithmetic, direction, threshold, NULLs") {
    import spark.implicits._
    // child.fk = {1,2,3,ORPHAN 99, NULL}; parent.pk = {1,2,3,4}
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(99L), None, Some(2L))
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    def run(threshold: Long) = Profile.fkDiscoveryOf(
      Seq(("child", child, Seq("fk")), ("parent", parent, Seq("pk"))),
      threshold)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // NULLs drop, duplicates dedup: |child.fk| = 4, common = 3 → 750000
    val all = run(0L)
    assert(all.toSet === Set(
      ("child.fk", "parent.pk", 4L, 3L, 750000L),
      ("parent.pk", "child.fk", 4L, 3L, 750000L)))
    // both directions clear 750000 ppm; neither clears 800000
    assert(run(750000L).length === 2)
    assert(run(800000L).isEmpty)
  }

  test("c11 direction matters: a strict subset is contained one way only") {
    import spark.implicits._
    val small = Seq(1L, 2L).toDF("k")
    val big = Seq(1L, 2L, 3L, 4L).toDF("k")
    val got = Profile.fkDiscoveryOf(
      Seq(("small", small, Seq("k")), ("big", big, Seq("k"))), 1000000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(got.toSeq === Seq(("small.k", "big.k", 1000000L)))
  }

  test("c11 fixture: the full true-FK skeleton is discovered at full containment") {
    val got = Profile.fkDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val skeleton = Seq(
      "nation.n_regionkey" -> "region.r_regionkey",
      "customer.c_nationkey" -> "nation.n_nationkey",
      "supplier.s_nationkey" -> "nation.n_nationkey",
      "orders.o_custkey" -> "customer.c_custkey",
      "lineitem.l_orderkey" -> "orders.o_orderkey",
      "lineitem.l_partkey" -> "part.p_partkey",
      "lineitem.l_suppkey" -> "supplier.s_suppkey")
    skeleton.foreach { edge =>
      assert(got.get(edge).contains(1000000L),
        s"true FK $edge not discovered at full containment: ${got.get(edge)}")
    }
  }

  test("c15 hand tables: determinacy, violation counts, direction, NULLs") {
    import spark.implicits._
    // k -> v holds (each k maps to one v); v -> k fails with exactly one
    // extra mapping (v=10 maps to k=1 AND k=2); NULL rows are excluded
    // from both sides of the pair
    val t = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(10L)), (Some(2L), Some(10L)),
      (Some(3L), Some(30L)), (None, Some(99L)), (Some(4L), None))
      .toDF("k", "v")
    val got = Profile.fdDiscoveryOf(Seq(("t", t, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // k->v: dets {1,2,3}, pairs {(1,10),(2,10),(3,30)} — holds
    assert(got(("k", "v")) === ((3L, 3L, true)))
    // v->k: dets {10,30}, pairs {(10,1),(10,2),(30,3)} — one violation
    assert(got(("v", "k")) === ((2L, 3L, false)))
  }

  test("c15 emits a vacuous-true row for a pair with zero NULL-free rows, " +
      "and rejects non-integral candidates loudly") {
    import spark.implicits._
    // column w is entirely NULL: both (k,w) directions have no NULL-free
    // rows — the contract (and the oracle's per-pair UNION ALL) still
    // emits one row per pair, as (0, 0, holds=true)
    val t = Seq((Some(1L), None: Option[Long]), (Some(2L), None))
      .toDF("k", "w")
    val got = Profile.fdDiscoveryOf(Seq(("t", t, Seq("k", "w"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.size === 2, "one row per ordered pair, even vacuous ones")
    assert(got(("k", "w")) === ((0L, 0L, true)))
    assert(got(("w", "k")) === ((0L, 0L, true)))
    // a string candidate must be a loud error, never a silently-dropped
    // or truncated pair (the cast("long") trap)
    val bad = Seq((1L, "x")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Profile.fdDiscoveryOf(Seq(("bad", bad, Seq("id", "name"))))
    }
    assert(e.getMessage.contains("non-integral"))
  }

  test("c15 fixture: key columns determine their attributes, reverses fail") {
    val got = Profile.fdDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(5)).toMap
    // unique keys determine every sibling candidate column
    Seq(
      ("nation", "n_nationkey", "n_regionkey"),
      ("customer", "c_custkey", "c_nationkey"),
      ("supplier", "s_suppkey", "s_nationkey"),
      ("part", "p_partkey", "p_size"),
      ("orders", "o_orderkey", "o_custkey")).foreach { fd =>
      assert(got.get(fd).contains(true), s"key FD $fd must hold: ${got.get(fd)}")
    }
    // the reverses cannot hold (many keys share a nation/size/customer)
    Seq(
      ("nation", "n_regionkey", "n_nationkey"),
      ("customer", "c_nationkey", "c_custkey"),
      ("part", "p_size", "p_partkey"),
      ("orders", "o_custkey", "o_orderkey")).foreach { fd =>
      assert(got.get(fd).contains(false), s"reverse FD $fd must fail")
    }
    // lineitem: a multi-line order breaks l_orderkey -> l_partkey
    assert(got.get(("lineitem", "l_orderkey", "l_partkey")).contains(false))
  }

  test("c16 seeded sample: a violated FD whose violating determinant is " +
      "IN the sample is refuted WITHOUT the exact NDV pass; one the " +
      "sample misses is caught by the exact survivor check") {
    import spark.implicits._
    // hash60('1') % 8 == 0 (sampled group); hash60('0') % 8 != 0
    // (unsampled). k -> v is violated at BOTH determinants:
    //   det 1 -> {10, 20}  (sampled: phase 1 refutes, phase 2 skipped)
    // and a second table where the ONLY violation sits at det 0
    // (unsampled: phase 1 passes, phase 2's exact check refutes).
    val sampledViolation = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(20L)), (Some(13L), Some(30L)))
      .toDF("k", "v")
    val got1 = Profile.fdSampledOf(Seq(("t", sampledViolation, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6),
          r.getBoolean(7)))).toMap
    // k->v: sampled dets {1, 13} (both hash into the bucket), mappings
    // {(1,10),(1,20),(13,30)} -> 2 vs 3: REFUTED from the sample alone,
    // exact_checked=false — the no-full-NDV-pass pin
    assert(got1(("k", "v")) === ((2L, 3L, true, false, false)),
      s"sampled refutation must skip the exact pass: ${got1(("k", "v"))}")
    // v->k: dets {10,20,30} — none hashes into the bucket (verified by
    // the sampled counts being 0) — survivor; exact check holds (each v
    // maps to one k)
    val (nd, np, refuted, checked, holds) = got1(("v", "k"))
    assert(nd === 0L && np === 0L && !refuted && checked && holds,
      s"unsampled holding pair must survive to a passing exact check: " +
        s"${got1(("v", "k"))}")

    val missedViolation = Seq(
      (Some(0L), Some(10L)), (Some(0L), Some(20L)), (Some(13L), Some(30L)))
      .toDF("k", "v")
    val got2 = Profile.fdSampledOf(Seq(("t", missedViolation, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    // the violation at det 0 is invisible to the sample (only det 13 is
    // sampled, and it is clean) — the exact survivor pass must catch it
    assert(got2(("k", "v")) === ((false, true, false)),
      s"sample-missed violation must fail the exact check: " +
        s"${got2(("k", "v"))}")
  }

  test("c16 soundness invariant on the fixture: every sample-refuted pair " +
      "is exactly-refuted (holds=false), and c16/c15 verdicts agree") {
    val sampled = Profile.fdSampled(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    val exact = Profile.fdDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(5)).toMap
    assert(sampled.keySet === exact.keySet)
    sampled.foreach { case (pair, (refuted, checked, holds)) =>
      assert(checked === !refuted, s"$pair: exact_checked must complement")
      assert(holds === exact(pair),
        s"$pair: two-phase verdict $holds != exact c15 verdict " +
          s"${exact(pair)} — the sample path is unsound or too eager")
    }
    // non-vacuous: the fixture genuinely exercises the refutation arm
    assert(sampled.values.exists(_._1),
      "no fixture pair was sample-refuted — the phase-1 arm is untested")
    assert(sampled.values.exists { case (r, _, h) => !r && h } ,
      "no fixture pair survived to a passing exact check")
  }

  test("c18 g3 repair cost: row-mass weighting distinguishes it from " +
      "c15's mapping diversity, and empty pairs are vacuous zeros") {
    import spark.implicits._
    // det 1 maps to 10 (x99 rows) and 20 (x1 row): ONE noisy row.
    //   g3 = 1 of 100 rows -> 10,000 ppm (quarantine one row);
    //   c15's diversity measure reads the same pair as 2 mappings vs
    //   1 determinant — a 50%-class violation. Same FD, two different
    //   questions; the spec pins both numbers.
    val rows = Seq.fill(99)((Option(1L), Option(10L))) ++
      Seq((Option(1L), Option(20L)), (Option(2L), Option(30L)),
        (Option(3L), None: Option[Long]))
    val t = rows.toDF("k", "v")
    val g3 = Profile.fdG3Of(Seq(("t", t, Seq("k", "v")))).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // k->v: 101 NULL-free rows, remove 1 -> 9900 ppm (101 rows: 99+1+1)
    assert(g3(("k", "v")) === ((101L, 1L, 1000000L / 101L, false)),
      s"g3 must count ROWS to remove: ${g3(("k", "v"))}")
    // v->k holds exactly: every v maps to one k
    assert(g3(("v", "k")) === ((101L, 0L, 0L, true)))
    val c15 = Profile.fdDiscoveryOf(Seq(("t", t, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // the SAME pair under the diversity measure: dets {1, 2} (k=3's v
    // is NULL, so the pair excludes it), mappings {(1,10),(1,20),(2,30)}
    // — one extra mapping regardless of the 99:1 row skew
    assert(c15(("k", "v")) === ((2L, 3L)))
    // all-NULL column: vacuous (0, 0, 0, true) in both directions
    val empty = Seq((Option(1L), Option.empty[Long])).toDF("k", "w")
    val g3e = Profile.fdG3Of(Seq(("t", empty, Seq("k", "w")))).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(g3e(("k", "w")) === ((0L, 0L, 0L, true)))
    assert(g3e(("w", "k")) === ((0L, 0L, 0L, true)))
  }

  test("c18 fixture: g3 holds agrees with c15's exact verdicts pair for " +
      "pair (g3 = 0 iff the FD holds)") {
    val g3 = Profile.fdG3(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(6)).toMap
    val exact = Profile.fdDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(5)).toMap
    assert(g3.keySet === exact.keySet)
    g3.foreach { case (pair, h) =>
      assert(h === exact(pair), s"$pair: g3 and exact verdicts diverge")
    }
    // non-vacuous: the fixture exercises both verdicts
    assert(g3.values.exists(identity) && g3.values.exists(!_))
  }

  test("c17 hand lattice: the composite holds where neither unary does, " +
      "and unary-implied composites are PRUNED from the output") {
    import spark.implicits._
    // (a, b) is a key (composite FD (a,b) -> c holds) but a -> c and
    // b -> c both fail; meanwhile d is constant per a (a -> d holds), so
    // every composite with dep d and a in the determinant must be pruned
    val t = Seq(
      (1L, 1L, 10L, 7L),
      (1L, 2L, 20L, 7L),
      (2L, 1L, 30L, 8L),
      (2L, 2L, 10L, 8L))
      .toDF("a", "b", "c", "d")
    val got = Profile.fdCompositeOf(Seq(("t", t, Seq("a", "b", "c", "d"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // (a,b) -> c: 4 distinct (a,b), 4 distinct (a,b,c) — HOLDS, and
    // neither a -> c (a=1 -> {10,20}) nor b -> c (b=1 -> {10,30}) does
    assert(got(("a", "b", "c")) === ((4L, 4L, true)),
      s"composite key FD must hold: ${got.keySet}")
    // (a,b) -> d survives pruning? NO — a -> d holds, so it's pruned
    assert(!got.contains(("a", "b", "d")),
      "a->d holds, so (a,b)->d is unary-implied and must be pruned")
    // (b,c) -> d: b -> d fails (b=1 -> {7,8}), c -> d fails (c=10 ->
    // {7,8}) — candidate survives; composite itself fails? (b,c) pairs:
    // (1,10),(2,20),(1,30),(2,10) all distinct -> 4 = 4 with d: HOLDS
    assert(got(("b", "c", "d")) === ((4L, 4L, true)))
    // (a,c) -> b: a->b fails (a=1 -> {1,2}), c->b fails (c=10 -> {1,2});
    // (a,c) distinct = 4, with b = 4 -> holds
    assert(got(("a", "c", "b")) === ((4L, 4L, true)))
  }

  test("c17 pruning soundness under NULLs: unary holds on the (a,c) " +
      "superset implies the composite on the (a,b,c) subset — pruning " +
      "never hides a failing composite") {
    import spark.implicits._
    // a -> c holds over (a,c) NULL-free rows, INCLUDING a row whose b is
    // NULL; the composite's row set is strictly smaller — still implied
    val t = Seq(
      (Some(1L), Some(1L), Some(10L)),
      (Some(1L), None, Some(10L)),
      (Some(2L), Some(1L), Some(20L)))
      .toDF("a", "b", "c")
    val got = Profile.fdCompositeOf(Seq(("t", t, Seq("a", "b", "c"))))
      .collect()
    // every composite with dep c is pruned (a -> c holds); remaining
    // candidates carry dep a or dep b only
    assert(!got.exists(r => r.getString(3) == "c"),
      s"composites with dep c must be pruned: ${got.mkString(",")}")
  }

  test("c17 fixture: lineitem's surviving candidates carry exact counts " +
      "and the level-1 pruning matches c15's verdicts") {
    val l1 = Profile.fdDiscovery(spark, sfDir).collect()
      .filter(_.getString(0) == "lineitem")
      .map(r => (r.getString(1), r.getString(2)) -> r.getBoolean(5)).toMap
    val got = Profile.fdComposite(spark, sfDir).collect()
    got.foreach { r =>
      val (d1, d2, dep) = (r.getString(1), r.getString(2), r.getString(3))
      assert(!l1((d1, dep)) && !l1((d2, dep)),
        s"($d1,$d2)->$dep emitted but a unary parent holds — pruning leak")
      assert(r.getLong(4) <= r.getLong(5),
        "n_det can never exceed n_pairs")
    }
    // the candidate set is exactly the unpruned lattice level 2
    val cs = Profile.FdCompositeCols.collectFirst {
      case ("lineitem", c) => c }.get
    val expected = (for {
      i <- cs.indices; j <- cs.indices if i < j
      c <- cs if c != cs(i) && c != cs(j)
      if !l1((cs(i), c)) && !l1((cs(j), c))
    } yield (cs(i), cs(j), c)).toSet
    assert(got.map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .toSet === expected)
  }

  test("c15 artifact reuse: the gate serves the persisted level-1 relation " +
      "and it equals the from-scratch discovery exactly") {
    val served = Profile.fdDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val fresh = Profile.fdDiscoveryOf(Profile.FdCandidateCols.map {
        case (t, cs) => (t, graft.Catalog.table(spark, sfDir, t), cs) })
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(served === fresh,
      "artifact-served c15 must equal the from-scratch discovery")
    // and repeat calls serve the same persisted files (no rebuild)
    val a = Profile.fdDiscovery(spark, sfDir).inputFiles.toSet
    val b = Profile.fdDiscovery(spark, sfDir).inputFiles.toSet
    assert(a.nonEmpty && a === b)
  }

  test("c11 artifact reuse: persisted distinct relation serves repeat runs " +
      "and matches the unamortized build exactly") {
    // round-11 verdict item #4: the distinct relation is a Scratch
    // artifact — a second call must read the SAME persisted path (no
    // rebuild), and the amortized c11 must equal the from-scratch form
    val d1 = Profile.fkDistinctRelation(spark, sfDir)
    val d2 = Profile.fkDistinctRelation(spark, sfDir)
    val p1 = d1.inputFiles.toSet
    val p2 = d2.inputFiles.toSet
    assert(p1.nonEmpty && p1 === p2,
      "repeat calls must serve the same persisted artifact files")
    val amortized = Profile.fkDiscovery(spark, sfDir).collect().toSeq
    val fresh = Profile.fkDiscoveryOf(
      Profile.FkCandidateCols.map { case (t, cs) =>
        (t, graft.Catalog.table(spark, sfDir, t), cs) },
      Profile.FkThresholdPpm).collect().toSeq
    assert(amortized === fresh,
      "artifact-served c11 must equal the unamortized build")
  }

  test("c18 artifact reuse: the gate serves the persisted g3 relation and " +
      "it equals the from-scratch computation exactly") {
    val served = Profile.fdG3(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val fresh = Profile.fdG3Of(Profile.FdCandidateCols.map { case (t, cs) =>
        (t, graft.Catalog.table(spark, sfDir, t), cs) }).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(served === fresh,
      "artifact-served c18 must equal the from-scratch g3 computation")
    val a = Profile.fdG3(spark, sfDir).inputFiles.toSet
    val b = Profile.fdG3(spark, sfDir).inputFiles.toSet
    assert(a.nonEmpty && a === b)
  }

  test("c20 seeded composite: a violation at a SAMPLED determinant pair " +
      "is refuted without the exact pass; one the sample misses is " +
      "caught by the exact survivor check") {
    import spark.implicits._
    // hash60('1:2') % 8 == 0 (sampled pair); '0:0' and '13:5' are not.
    // In both tables a -> b and b -> a hold (constant per det), so
    // (a,c) -> b and (b,c) -> a are level-1-pruned and the ONLY
    // candidate is (a,b) -> c — violated at one determinant pair.
    val sampledViolation = Seq(
      (1L, 2L, 10L), (1L, 2L, 20L), (13L, 5L, 30L))
      .toDF("a", "b", "c")
    val got1 = Profile.fdCompositeSampledOf(
        Seq(("t", sampledViolation, Seq("a", "b", "c")))).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
          r.getBoolean(8)))).toMap
    assert(got1.keySet === Set(("a", "b", "c")),
      s"level-1 pruning must leave exactly one candidate: ${got1.keySet}")
    // sampled slice sees only pair (1,2): 1 det group, 2 mappings —
    // refuted from the sample alone, exact pass skipped
    assert(got1(("a", "b", "c")) === ((1L, 2L, true, false, false)),
      s"sampled composite refutation must skip the exact pass: $got1")

    val missedViolation = Seq(
      (0L, 0L, 10L), (0L, 0L, 20L), (13L, 5L, 30L))
      .toDF("a", "b", "c")
    val got2 = Profile.fdCompositeSampledOf(
        Seq(("t", missedViolation, Seq("a", "b", "c")))).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
          r.getBoolean(8)))).toMap
    // neither (0,0) nor (13,5) hashes into the bucket: the sample is
    // EMPTY, the candidate survives, and the exact pass refutes it
    assert(got2(("a", "b", "c")) === ((0L, 0L, false, true, false)),
      s"sample-missed composite violation must fail the exact check: $got2")
  }

  test("c20 soundness on the fixture: two-phase composite verdicts agree " +
      "with c17's exact lattice candidate for candidate") {
    val sampled = Profile.fdCompositeSampled(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) ->
        ((r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    val exact = Profile.fdComposite(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) -> r.getBoolean(6)).toMap
    assert(sampled.keySet === exact.keySet,
      "the two operators must enumerate the SAME unpruned candidate set")
    sampled.foreach { case (comp, (refuted, checked, holds)) =>
      assert(checked === !refuted, s"$comp: exact_checked must complement")
      assert(holds === exact(comp),
        s"$comp: two-phase verdict $holds != c17 exact ${exact(comp)}")
    }
  }

  test("c21 seeded sample: a duplicated value in a SAMPLED group refutes " +
      "uniqueness without the exact pass; one the sample misses is " +
      "caught by the exact survivor check") {
    import spark.implicits._
    // under c21's xorshift keep: value 2 samples, values 1 and 13 do not
    // (verified against the mix in Python and pinned here).
    // k duplicates value 2 (sampled -> phase-1 refutes); v is unique.
    val sampledDup = Seq((2L, 10L), (2L, 20L), (13L, 30L)).toDF("k", "v")
    val got1 = Profile.keySampledOf(Seq(("t", sampledDup, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))))
      .toMap
    val (mx, refuted, checked, key) = got1(("k", ""))
    assert(mx === 2L && refuted && !checked && !key,
      s"sampled duplicate must refute without the exact pass: $got1")
    val (_, refV, chkV, keyV) = got1(("v", ""))
    assert(!refV && chkV && keyV, s"v must survive to a passing exact: $got1")
    // no unary key pruning gap: k refuted, v unique -> (k, v) pruned
    assert(!got1.contains(("k", "v")),
      s"supersets of the unique v must be pruned: ${got1.keySet}")

    // the duplicate sits at value 1 (unsampled) -> phase 1 passes, the
    // exact survivor check refutes
    val missedDup = Seq((1L, 10L), (1L, 20L), (13L, 30L)).toDF("k", "v")
    val got2 = Profile.keySampledOf(Seq(("t", missedDup, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(got2(("k", "")) === ((false, true, false)),
      s"sample-missed duplicate must fail the exact check: $got2")

    // duplicated NULLs refute ONLY via the exact pass (NULL never
    // samples) — the c19 NULL-groups-as-values semantics preserved
    val nullDup = Seq((None: Option[Long], 1L), (None: Option[Long], 2L),
      (Some(13L), 3L)).toDF("k", "v")
    val got3 = Profile.keySampledOf(Seq(("t", nullDup, Seq("k", "v"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(got3(("k", "")) === ((false, true, false)),
      s"NULL-group duplicate must be exact-caught, never sampled: $got3")
  }

  test("c21 soundness on the fixture: two-phase key verdicts agree with " +
      "c19's exact lattice candidate for candidate, and both phases " +
      "are non-vacuously exercised") {
    val sampled = Profile.keySampled(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    val exact = Profile.keyDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(6)).toMap
    assert(sampled.keySet === exact.keySet,
      "the two operators must enumerate the SAME candidate set")
    sampled.foreach { case (cand, (refuted, checked, isKey)) =>
      assert(checked === !refuted, s"$cand: exact_checked must complement")
      assert(isKey === exact(cand),
        s"$cand: two-phase verdict $isKey != c19 exact ${exact(cand)}")
    }
    assert(sampled.values.exists(_._1),
      "no fixture candidate was sample-refuted — phase 1 untested")
    assert(sampled.values.exists { case (r, _, k) => !r && k },
      "no fixture candidate survived to a passing exact check")
  }

  test("c19 hand lattice: a 2-column key exists where no unary key does, " +
      "and supersets of a unique unary are NEVER counted") {
    import spark.implicits._
    // a, b each repeat (no unary key); k is unique; (a, b) is a key
    val t = Seq(
      (1L, 1L, 100L),
      (1L, 2L, 101L),
      (2L, 1L, 102L),
      (2L, 2L, 103L))
      .toDF("a", "b", "k")
    val rows = Profile.keyDiscoveryOf(Seq(("t", t, Seq("a", "b", "k"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getInt(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows(("a", "")) === ((1, 2L, 2L, false)))
    assert(rows(("b", "")) === ((1, 2L, 2L, false)))
    assert(rows(("k", "")) === ((1, 4L, 1L, true)), "k is a unary key")
    // the ONE unpruned level-2 candidate: both a and b are non-unique
    assert(rows(("a", "b")) === ((2, 4L, 1L, true)),
      "(a, b) is a minimal 2-column key")
    // supersets of the unique k are pruned — never counted, absent
    assert(!rows.contains(("a", "k")) && !rows.contains(("b", "k")),
      s"pruned supersets of the unary key leaked into the output: " +
        s"${rows.keySet}")
    assert(rows.size === 4, s"exactly 3 unary + 1 composite rows: $rows")
  }

  test("c19 semantics: NULLs group as values and duplicate ROWS break a " +
      "key the distinct projection would hide") {
    import spark.implicits._
    // two NULLs agree on x -> x is not unique; rows 3 and 4 are exact
    // duplicates, so (x, y) is not a key despite a fully-distinct
    // PROJECTION of the table
    val t = Seq(
      (None: Option[Long], 1L),
      (None: Option[Long], 2L),
      (Some(7L), 3L),
      (Some(7L), 3L))
      .toDF("x", "y")
    val rows = Profile.keyDiscoveryOf(Seq(("t", t, Seq("x", "y"))))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows(("x", "")) === ((2L, 2L, false)),
      "NULL = NULL under GROUP BY: two NULL rows share a group")
    assert(rows(("y", "")) === ((3L, 2L, false)))
    assert(rows(("x", "y")) === ((3L, 2L, false)),
      "the duplicated (7, 3) row must break the composite key")
  }

  test("c19 artifact reuse: the gate serves the persisted key relation " +
      "and it equals the from-scratch discovery exactly") {
    val served = Profile.keyDiscovery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getInt(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val fresh = Profile.keyDiscoveryOf(Profile.FkCandidateCols.map {
        case (t, cs) => (t, graft.Catalog.table(spark, sfDir, t), cs) })
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getInt(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(served === fresh,
      "artifact-served c19 must equal the from-scratch discovery")
    val a = Profile.keyDiscovery(spark, sfDir).inputFiles.toSet
    val b = Profile.keyDiscovery(spark, sfDir).inputFiles.toSet
    assert(a.nonEmpty && a === b)
  }

  test("c19 fixture: the TPC-H primary keys surface as unary keys and " +
      "no level-2 row contains a unique unary column") {
    val rows = Profile.keyDiscovery(spark, sfDir).collect()
    val unaryKeys = rows.filter(r => r.getInt(3) == 1 && r.getBoolean(6))
      .map(r => (r.getString(0), r.getString(1))).toSet
    Seq(("region", "r_regionkey"), ("nation", "n_nationkey"),
      ("customer", "c_custkey"), ("supplier", "s_suppkey"),
      ("part", "p_partkey"), ("orders", "o_orderkey")).foreach { k =>
      assert(unaryKeys.contains(k), s"expected unary key $k missing")
    }
    rows.filter(_.getInt(3) == 2).foreach { r =>
      val t = r.getString(0)
      assert(!unaryKeys.contains((t, r.getString(1))) &&
        !unaryKeys.contains((t, r.getString(2))),
        s"level-2 row $r contains a unique unary — pruning failed")
    }
  }
}
