package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PageRank semantics pinned by hand: the integer micro-unit update is
  * deterministic, so two supersteps on a four-node graph have exactly one
  * correct answer — computed on paper, asserted to the unit.
  */
class GraphSpec extends SparkSuite {

  // 0 → {1, 2}, 1 → {2}, 2 → {0}; 3 isolated (no links either way)
  private def handEdges(): DataFrame = {
    import spark.implicits._
    Seq((0L, 1L, 2L), (0L, 2L, 2L), (1L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "deg")
  }
  private def handNodes(): DataFrame = {
    import spark.implicits._
    Seq(0L, 1L, 2L, 3L).toDF("doc_id")
  }

  private def ranksAfter(iters: Int): Map[Long, Long] =
    Graph.pageRankOf(() => handNodes(), () => handEdges(), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two supersteps match the hand-computed integer fixpoint exactly") {
    // iter1: contribs 1←500000, 2←1500000, 0←1000000
    //   r1 = (0: 1000000, 1: 575000, 2: 1425000, 3: 150000)
    // iter2: contribs 1←500000, 2←1075000, 0←1425000
    //   r2 = (0: 1361250, 1: 575000, 2: 1063750, 3: 150000)
    assert(ranksAfter(1) ===
      Map(0L -> 1000000L, 1L -> 575000L, 2L -> 1425000L, 3L -> 150000L))
    assert(ranksAfter(2) ===
      Map(0L -> 1361250L, 1L -> 575000L, 2L -> 1063750L, 3L -> 150000L))
  }

  test("a node nobody links to holds exactly the base mass") {
    assert(ranksAfter(Graph.Iters)(3L) === Graph.BaseMicro)
  }

  test("pageRankUntil: eps=0 reaches the exact integer fixpoint; result " +
      "equals the fixed-iter form run to the same depth") {
    // round-11 verdict item #6: the documented L1-delta deployment stop
    val (ranksDf, it) = Graph.pageRankUntil(
      () => handNodes(), () => handEdges(), epsL1Micro = 0L, maxIters = 60)
    val got = ranksDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(it < 60, "hand graph must converge before the iteration cap")
    // delta == 0 means a true fixpoint: one more fixed iteration is a no-op
    assert(got === ranksAfter(it), "converged ranks = fixed-iter form at it")
    assert(got === ranksAfter(it + 1), "fixpoint: further supersteps no-op")
  }

  test("pageRankUntil on the fixture graph converges and matches the k1 gate " +
      "once past the gate's fixed depth") {
    val idx = Graph.linkGraph(spark, sfDir)
    val nodes = () => graft.Catalog.documents(spark, sfDir).select(
      org.apache.spark.sql.functions.col("doc_id"))
    val edges = () => spark.read.parquet(idx)
    val (convergedDf, it) = Graph.pageRankUntil(nodes, edges, 0L, 60)
    assert(it < 60, "fixture graph must reach the integer fixpoint")
    val converged = convergedDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the gate runs a fixed 8 supersteps; if the fixpoint arrives at or
    // before 8, the gate result IS the converged result — otherwise the
    // fixed form at `it` must agree (same core, same depth)
    val fixedAtIt = Graph.pageRankOf(nodes, edges, it).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged === fixedAtIt,
      "convergence-stop form must equal the fixed-iter core at its depth")
    if (it <= Graph.Iters) {
      val gate = Graph.pageRankOf(nodes, edges, Graph.Iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(converged === gate, "fixpoint before the gate depth ⇒ equal")
    }
  }

  test("k8 degree profile: hand graph buckets, zero-degree first-class") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = Graph.degreeProfileOf(nodes, edges).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // in-degrees: 0->1, 1->1, 2->2, 3->0; out: 0->2, 1->1, 2->1, 3->0
    assert(got(("in", 0L)) === ((1L, 0L)), "node 3 must land in bucket 0")
    assert(got(("in", 1L)) === ((2L, 2L)))
    assert(got(("in", 2L)) === ((1L, 2L)))
    assert(got(("out", 0L)) === ((1L, 0L)))
    assert(got(("out", 1L)) === ((2L, 2L)))
    assert(got(("out", 2L)) === ((1L, 2L)))
    assert(got.size === 6)
  }

  test("k8 fixture: both directions account every node and every edge") {
    val rows = Graph.degreeProfile(spark, sfDir).collect()
    val docs = graft.Catalog.documents(spark, sfDir).count()
    val edges = spark.read.parquet(Graph.linkGraph(spark, sfDir)).count()
    for (d <- Seq("in", "out")) {
      val side = rows.filter(_.getString(0) == d)
      assert(side.map(_.getLong(2)).sum === docs,
        s"$d-side histogram must cover every node exactly once")
      assert(side.map(_.getLong(3)).sum === edges,
        s"$d-side degree mass must equal the edge count")
    }
  }

  test("an edgeless graph damps every node to the base mass") {
    val got = Graph.pageRankOf(() => handNodes(),
        () => handEdges().limit(0), 1)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(Graph.BaseMicro))
  }

  // ---------------------------------------------------------------------
  // k2/d12 — min-label components
  // ---------------------------------------------------------------------

  /** Symmetric path 0–1–2 plus isolated 3 (the componentsOf contract:
    * edges arrive symmetric, endpoints ⊆ nodes).
    */
  private def pathEdges(): DataFrame = {
    import spark.implicits._
    Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
  }

  private def labelsAfter(iters: Int): Map[Long, Long] =
    Graph.componentsOf(() => handNodes(), () => pathEdges(), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("min-label propagation walks the path one hop per superstep") {
    // node 2 is two hops from the component min 0: after one superstep it
    // still carries 1, after two it has converged to 0
    assert(labelsAfter(1) === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 3L))
    assert(labelsAfter(2) === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
  }

  test("an edgeless graph keeps every node its own component") {
    val got = Graph.componentsOf(() => handNodes(),
        () => pathEdges().limit(0), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("fixture components: fixpoint reached and every edge is intra-component") {
    val atIters = Graph.components(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Catalog.documents(spark, sfDir).count()
    assert(atIters.size.toLong === docs, "one component label per document")
    // convergence: one more superstep must change nothing (diameter of the
    // fixture link graph is comfortably inside the fixed superstep count)
    val idx = Graph.componentEdges(spark, sfDir)
    val onceMore = Graph.componentsOf(
        () => graft.Catalog.documents(spark, sfDir).select(col("doc_id")),
        () => spark.read.parquet(idx), Graph.Iters + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(onceMore === atIters, "labels still moving at Iters — not a fixpoint")
    // a converged labeling is edge-consistent: both endpoints share a label
    spark.read.parquet(idx).collect().foreach { e =>
      assert(atIters(e.getLong(0)) === atIters(e.getLong(1)),
        s"edge ${e.getLong(0)}–${e.getLong(1)} crosses components")
    }
    // component ids are canonical: each equals the least member id
    atIters.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min === c, s"component $c is not its least member")
    }
  }

  test("d12 clusters match an independent union-find over the pair relation") {
    val pairs = graft.operators.Dedup.jaccardPairsIndexed(spark, sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — vacuous test")
    // driver-side union-find ground truth (path-compressed, min-rooted)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val truth = parent.keys.map(x => x -> find(x)).toMap
    val got = Graph.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(g => g._1 -> g._2).toMap === truth,
      "component labels diverge from union-find ground truth")
    // exactly one keeper per cluster, and it is the least member
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._3) === 1, s"cluster $c keeper count != 1")
      assert(members.filter(_._3).head._1 === c, s"cluster $c keeper not min")
      assert(members.map(_._1).min === c)
    }
  }

  // ---------------------------------------------------------------------
  // k3 — triangle counting
  // ---------------------------------------------------------------------

  /** Symmetrize an undirected edge list given as one row per edge. */
  private def sym(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def triStats(nodes: Seq[Long], pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    Graph.triangleStatsOf(() => nodes.toDF("doc_id"), () => sym(pairs))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("triangle + pendant: hand-computed counts, degrees, coefficients") {
    // triangle 0-1-2 with pendant 3 hanging off 0
    val got = triStats(Seq(0L, 1L, 2L, 3L),
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)))
    assert(got === Map(
      0L -> ((1L, 3L, 333333L)),   // 2e6·1 / (3·2)
      1L -> ((1L, 2L, 1000000L)),  // closed neighborhood: cc = 1
      2L -> ((1L, 2L, 1000000L)),
      3L -> ((0L, 1L, 0L))))       // deg < 2: coefficient defined as 0
  }

  test("K4: every vertex sits on 3 triangles, each triangle counted once") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = triStats(Seq(0L, 1L, 2L, 3L), k4)
    got.foreach { case (_, (tri, deg, cc)) =>
      assert((tri, deg, cc) === ((3L, 3L, 1000000L)))
    }
    // 4 vertices × 3 = 12 incidences = 4 distinct triangles, not 4·3!
    assert(got.values.map(_._1).sum === 12L)
  }

  test("an edgeless graph zero-fills every node") {
    val got = triStats(Seq(0L, 1L, 2L), Seq.empty)
    assert(got.values.toSet === Set((0L, 0L, 0L)))
  }

  test("fixture triangles match a driver-side brute-force count") {
    val idx = Graph.componentEdges(spark, sfDir)
    val edges = spark.read.parquet(idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // brute force: per node, count UNORDERED neighbor pairs that are
    // themselves adjacent — each triangle contributes exactly 1 per vertex
    val brute = adj.map { case (a, ns) =>
      a -> ns.toSeq.combinations(2).count {
        case Seq(b, c) => edges.contains((b, c))
        case _ => false
      }.toLong
    }
    val got = Graph.triangleStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.count(_._2 > 0L) > 0, "fixture graph has no triangles — vacuous")
    brute.foreach { case (id, tri) =>
      assert(got(id) === tri, s"node $id brute=$tri engine=${got(id)}")
    }
    got.filter(_._2 > 0L).keys.foreach(id =>
      assert(brute.getOrElse(id, 0L) === got(id)))
  }

  // ---------------------------------------------------------------------
  // k4 — HITS
  // ---------------------------------------------------------------------

  private def hitsAfter(iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    Graph.hitsOf(() => handNodes(), () => edges, iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("hits: two alternations match the hand-computed integer scores") {
    // iter1: a_raw(1)=1e6, a_raw(2)=2e6 → a=(500000, 1000000)
    //   h_raw(0)=1.5e6, h_raw(1)=1e6 → h=(1000000, 666666)
    assert(hitsAfter(1) === Map(
      0L -> ((1000000L, 0L)), 1L -> ((666666L, 500000L)),
      2L -> ((0L, 1000000L)), 3L -> ((0L, 0L))))
    // iter2: a_raw(1)=1e6, a_raw(2)=1666666 → a=(600000, 1000000)
    //   h_raw(0)=1.6e6, h_raw(1)=1e6 → h=(1000000, 625000)
    assert(hitsAfter(2) === Map(
      0L -> ((1000000L, 0L)), 1L -> ((625000L, 600000L)),
      2L -> ((0L, 1000000L)), 3L -> ((0L, 0L))))
  }

  test("hits: an edgeless graph scores everyone zero — no base mass") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Graph.hitsOf(() => handNodes(), () => none, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L)))
  }

  test("fixture hits: normalization caps hold and the split is non-vacuous") {
    val got = Graph.hits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(g => g._2 >= 0L && g._2 <= Graph.UnitMicro))
    assert(got.forall(g => g._3 >= 0L && g._3 <= Graph.UnitMicro))
    // max-normalization pins at least one node at exactly the cap, per side
    assert(got.exists(_._2 === Graph.UnitMicro), "no hub at the cap")
    assert(got.exists(_._3 === Graph.UnitMicro), "no authority at the cap")
    // the hub/authority split genuinely separates: both strict orderings
    // occur (a pure authority would need an in-linked NULL-text doc —
    // data-dependent, so assert separation, not zeros)
    assert(got.exists(g => g._2 > g._3), "no hub-dominant node")
    assert(got.exists(g => g._3 > g._2), "no authority-dominant node")
  }

  test("fixture ranks: mass leaks but never grows, floor holds, skew exists") {
    val ranks = Graph.pageRank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val docs = graft.Catalog.documents(spark, sfDir).count()
    assert(ranks.length.toLong === docs, "one rank per document")
    val vals = ranks.map(_._2)
    // floor-truncation only ever DROPS mass vs the N·1e6 start
    assert(vals.sum <= docs * Graph.UnitMicro)
    assert(vals.min >= Graph.BaseMicro)
    // the content-derived graph is skewed enough to separate documents
    assert(vals.max > vals.min,
      "link structure produced no rank separation — graph degenerate")
  }

  // ------------------------------------------------------------------
  // k5 — k-core peeling
  // ------------------------------------------------------------------

  /** Symmetric edge relation from undirected pairs. */
  private def symEdges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  // 5-clique {0..4}, pendant path 0–5–6–7
  private def cliquePlusPath(): DataFrame = {
    val clique = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    symEdges(clique ++ Seq((0L, 5L), (5L, 6L), (6L, 7L)): _*)
  }
  private def cliquePathNodes(): DataFrame = {
    import spark.implicits._
    (0L to 7L).toDF("doc_id")
  }

  test("kcore peels the path one node per round; degrees are the certified cut") {
    def run(rounds: Int) =
      Graph.kcoreOf(() => cliquePathNodes(), () => cliquePlusPath(), 2, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops 7 (deg 1); round 2 drops 6 (deg 1 once 7 is gone);
    // round 3 drops 5 — but 0's degree still counts 5 this round, since
    // deg is measured in the PREVIOUS round's subgraph
    assert(run(3) ===
      Map(0L -> 5L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
    // round 4 reaches the fixpoint: the clique at its true core degrees
    assert(run(4) ===
      Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
    assert(run(5) === run(4), "peeling not at fixpoint after the set froze")
  }

  test("kcore above the max degree empties; k=0 keeps every edged node") {
    val none = Graph.kcoreOf(
      () => cliquePathNodes(), () => cliquePlusPath(), 10, 3).collect()
    assert(none.isEmpty)
    val all = Graph.kcoreOf(
      () => cliquePathNodes(), () => cliquePlusPath(), 0, 2)
      .collect().map(_.getLong(0)).sorted
    // an ISOLATED node never appears (no edge rows to count) — by design:
    // the k-core of an edgeless node is empty for any k >= 1, and the
    // gate's k is 4
    assert(all.toSeq === (0L to 7L))
  }

  test("kcore matches a reference peeler on random graphs, any extra round a no-op") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 12 + rnd.nextInt(8)
      val pairs = (for {
        a <- 0L until n.toLong; b <- 0L until n.toLong
        if a < b && rnd.nextInt(100) < 25
      } yield (a, b)).toSeq
      // driver-side reference peeler to an actual fixpoint
      def peel(k: Int): Map[Long, Long] = {
        var alive = (0L until n.toLong).toSet
        var deg = Map.empty[Long, Long]
        var changed = true
        while (changed) {
          deg = alive.map(v => v -> pairs.count { case (a, b) =>
            (a == v && alive(b)) || (b == v && alive(a))
          }.toLong).toMap
          val next = alive.filter(v => deg(v) >= k)
          changed = next != alive
          alive = next
        }
        alive.map(v => v -> deg(v)).toMap
      }
      import spark.implicits._
      def nodes() = (0L until n.toLong).toDF("doc_id")
      def edges() = symEdges(pairs: _*)
      val k = 2 + rnd.nextInt(2)
      val rounds = 20 // generous: past any fixpoint on 20 nodes
      val got = Graph.kcoreOf(nodes _, edges _, k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == peel(k), s"n=$n k=$k: $got vs ${peel(k)}")
      val more = Graph.kcoreOf(nodes _, edges _, k, rounds + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(more == got, "extra round changed a fixpoint")
    }
  }

  test("fixture kcore: gate rounds reach the fixpoint and the core is proper") {
    val sym = Graph.componentEdges(spark, sfDir)
    def run(rounds: Int) =
      Graph.kcoreOf(
        () => graft.Catalog.documents(spark, sfDir).select(col("doc_id")),
        () => spark.read.parquet(sym),
        Graph.KCoreK, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val atGate = run(Graph.KCoreRounds)
    assert(atGate === run(Graph.KCoreRounds + 1),
      "gate round count does not reach the peeling fixpoint on the fixture")
    val docs = graft.Catalog.documents(spark, sfDir).count()
    assert(atGate.nonEmpty, "core empty — k too high for the fixture graph")
    assert(atGate.size < docs.toInt, "nothing peeled — k vacuous")
    assert(atGate.forall(_._2 >= Graph.KCoreK))
  }

  // ---------------------------------------------------------------------
  // k6 — multi-source BFS hop distance
  // ---------------------------------------------------------------------

  /** Symmetric path 0–1–2–3 plus isolated 4. */
  private def bfsPathEdges(): DataFrame = {
    import spark.implicits._
    Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
  }
  private def bfsNodes(): DataFrame = {
    import spark.implicits._
    Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
  }
  private def seedsOf(ids: Long*): () => DataFrame = { () =>
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def hopsAfter(seeds: Seq[Long], rounds: Int): Map[Long, Long] =
    Graph.bfsHopsOf(() => bfsNodes(), () => bfsPathEdges(),
        seedsOf(seeds: _*), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfs walks the path one layer per round; truncation reports -1") {
    assert(hopsAfter(Seq(0L), 2) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> -1L, 4L -> -1L))
    assert(hopsAfter(Seq(0L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> -1L))
  }

  test("multi-source bfs takes the least distance over seeds") {
    assert(hopsAfter(Seq(0L, 3L), 2) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> -1L))
  }

  test("bfs from no seeds reaches nothing; extra rounds past the fixpoint are no-ops") {
    assert(hopsAfter(Seq.empty, 3).values.toSet === Set(-1L))
    assert(hopsAfter(Seq(0L), 5) === hopsAfter(Seq(0L), 3),
      "rounds past the path's diameter changed settled distances")
  }

  test("fixture bfs: seeds at 0, layers certified by a hop-1 neighbor") {
    val got = Graph.bfsHops(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Catalog.documents(spark, sfDir).count()
    assert(got.size.toLong === docs, "one hop row per document")
    got.foreach { case (id, h) =>
      if (id % Graph.BfsSeedMod == 0) assert(h === 0L, s"seed $id not at hop 0")
      else assert(h === -1L || (h >= 1L && h <= Graph.BfsRounds),
        s"doc $id hop $h outside [1, ${Graph.BfsRounds}] ∪ {-1}")
    }
    assert(got.values.exists(_ > 0L), "no non-seed reached — vacuous fixture")
    // BFS certificate: every reached non-seed has a neighbor one hop closer
    val sym = spark.read.parquet(Graph.componentEdges(spark, sfDir))
      .collect().map(e => e.getLong(0) -> e.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    got.filter { case (_, h) => h >= 1L }.foreach { case (id, h) =>
      val nbrs = sym.getOrElse(id, Set.empty)
      assert(nbrs.exists(n => got(n) == h - 1),
        s"doc $id at hop $h has no hop-${h - 1} neighbor")
    }
    // layer prefix-stability: one more round never changes a settled hop
    val more = Graph.bfsHopsOf(
        () => graft.Catalog.documents(spark, sfDir).select(col("doc_id")),
        () => spark.read.parquet(Graph.componentEdges(spark, sfDir)),
        () => graft.Catalog.documents(spark, sfDir)
          .filter(col("doc_id") % Graph.BfsSeedMod === 0L)
          .select(col("doc_id")),
        Graph.BfsRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.filter(_._2 >= 0L).foreach { case (id, h) =>
      assert(more(id) === h, s"settled hop moved for $id: $h → ${more(id)}")
    }
  }

  // ---------------------------------------------------------------------
  // k7 — personalized PageRank / TrustRank
  // ---------------------------------------------------------------------

  private def trustAfter(seeds: Seq[Long], iters: Int): Map[Long, Long] =
    Graph.trustRankOf(() => handNodes(), () => handEdges(),
        seedsOf(seeds: _*), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("trustrank: two supersteps match the hand-computed seeded fixpoint") {
    // seed {0}: r0 = (1e6, 0, 0, 0)
    // iter1: contribs 1←500000, 2←500000, 0←0
    //   r1 = (0: 150000, 1: 425000, 2: 425000, 3: 0)
    // iter2: contribs 0←425000, 1←75000, 2←75000+425000
    //   r2 = (0: 511250, 1: 63750, 2: 425000, 3: 0)
    assert(trustAfter(Seq(0L), 1) ===
      Map(0L -> 150000L, 1L -> 425000L, 2L -> 425000L, 3L -> 0L))
    assert(trustAfter(Seq(0L), 2) ===
      Map(0L -> 511250L, 1L -> 63750L, 2L -> 425000L, 3L -> 0L))
  }

  test("trustrank with no seeds is identically zero; all-seeds equals k1") {
    assert(trustAfter(Seq.empty, 3).values.toSet === Set(0L))
    val allSeeded = trustAfter(Seq(0L, 1L, 2L, 3L), Graph.Iters)
    val pr = ranksAfter(Graph.Iters)
    assert(allSeeded === pr,
      "teleporting to every node must degenerate to plain PageRank")
  }

  test("fixture trustrank: dominated by k1 pointwise, seeds carry base mass") {
    val trust = Graph.trustRank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rank = Graph.pageRank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(trust.keySet === rank.keySet)
    trust.foreach { case (id, t) =>
      assert(t <= rank(id),
        s"doc $id: trust $t exceeds pagerank ${rank(id)} — " +
          "seed-restricted teleport can never add mass")
      if (id % Graph.BfsSeedMod == 0)
        assert(t >= Graph.BaseMicro, s"seed $id below base mass")
    }
    assert(trust.values.exists(_ > 0L) && trust.values.exists(_ == 0L),
      "fixture should have both trusted and untrusted documents")
  }

  // ---------------------------------------------------------------------
  // Random-graph properties: the relational kernels against independent
  // driver-side reference implementations (the kcore discipline applied
  // to the k6/k7 additions).
  // ---------------------------------------------------------------------

  test("bfs matches a reference driver BFS on random graphs, cap honored") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + rnd.nextInt(10)
      val pairs = for {
        a <- 0 until n; b <- 0 until n
        if a < b && rnd.nextDouble() < 0.12
      } yield (a.toLong, b.toLong)
      val seeds = (0 until n).map(_.toLong).filter(_ => rnd.nextDouble() < 0.2)
      val rounds = 4
      // reference: queue BFS, layer-capped
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val dist = scala.collection.mutable.Map[Long, Long]()
      seeds.foreach(s => dist(s) = 0L)
      var frontier = seeds.toSet
      for (h <- 1 to rounds) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = h.toLong)
      }
      val expected = (0L until n.toLong)
        .map(v => v -> dist.getOrElse(v, -1L)).toMap
      import spark.implicits._
      val got = Graph.bfsHopsOf(
          () => (0L until n.toLong).toDF("doc_id"),
          () => symEdges(pairs: _*),
          seedsOf(seeds: _*), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: n=$n seeds=$seeds")
    }
  }

  test("trustrank matches a reference driver integer simulation on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 8 + rnd.nextInt(8)
      // directed edges with explicit out-degree (the edges() contract)
      val raw = for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.2
      } yield (a.toLong, b.toLong)
      val deg = raw.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val seeds = (0 until n).map(_.toLong).filter(_ % 3 == 0)
      val iters = 4
      // reference: the exact integer update simulated on the driver
      var r = (0L until n.toLong)
        .map(v => v -> (if (seeds.contains(v)) Graph.UnitMicro else 0L)).toMap
      for (_ <- 1 to iters) {
        val c = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        raw.foreach { case (a, b) => c(b) += r(a) / deg(a) }
        r = (0L until n.toLong).map { v =>
          val s = if (seeds.contains(v)) 1L else 0L
          v -> (s * Graph.BaseMicro +
            (Graph.DampMicro * c(v)) / Graph.UnitMicro)
        }.toMap
      }
      import spark.implicits._
      val edgesDf = raw.map { case (a, b) => (a, b, deg(a)) }
        .toDF("src", "dst", "deg")
      val got = Graph.trustRankOf(
          () => (0L until n.toLong).toDF("doc_id"),
          () => edgesDf,
          seedsOf(seeds: _*), iters)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === r, s"trial $trial: n=$n")
    }
  }
}
