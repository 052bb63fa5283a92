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

  test("an edgeless graph damps every node to the base mass") {
    val got = Graph.pageRankOf(() => handNodes(),
        () => handEdges().limit(0), 1)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(Graph.BaseMicro))
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
}
