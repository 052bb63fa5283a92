package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Catalog

/** Link-graph analytics — PageRank over a document link graph
  * (training-data extension).
  *
  * Why this belongs in a corpus engine: crawl-scale curation weighs
  * documents by the link structure they sit in (the CommonCrawl lineage —
  * harmonic/PageRank centrality as a quality prior feeding the z5/z10
  * mixing weights), and PageRank is the canonical representative of the
  * whole iterative-fixpoint family (label propagation, HITS, Katz) that a
  * declarative engine must express WITHOUT a graph runtime: each iteration
  * is one equi-join (rank → out-edges) plus one hash aggregate (sum of
  * contributions by target), which is exactly Pregel's message pass
  * re-expressed relationally (Malewicz et al. 2010; Page et al. 1999).
  *
  * Determinism (the x10/b1 lesson generalized to an ITERATED computation):
  * floating-point PageRank is summation-order-dependent, and after 8
  * iterations any per-iteration ulp wobble amplifies — no hash-exact
  * cross-engine gate could hold. All arithmetic here is 64-bit integer
  * micro-units: ranks start at 1e6, each hop contributes
  * `rank div out_degree`, and the damped update is
  * `150_000 + (850_000 * sum) div 1_000_000` — integer sums are
  * order-independent, so Spark at any parallelism and DuckDB single-threaded
  * produce BIT-IDENTICAL ranks. Floor-truncation leaks mass (sum of ranks
  * only ever falls below N·1e6), which is fine: the consumer ranks and
  * thresholds, it never needs a probability simplex. Dangling mass is
  * dropped, not redistributed, for the same reason. Overflow headroom:
  * contributions are bounded by total mass N·1e6, so the 850_000·sum
  * product needs N ≲ 1e7 per unit; beyond that, rescale the unit (the
  * constant is a parameter, not a law).
  *
  * Graph derivation: the synthetic fixtures carry no hyperlinks, so the
  * link structure is CONTENT-DERIVED — each document links to the three
  * docs addressed by its 60-bit content hash (`h % n`, `(h div 7) % n`,
  * `(h div 49) % n`, self-loops dropped) — deterministic, skewed in-degree
  * (some docs collect many links, most none), and recomputable by the
  * DuckDB oracle from the same bytes. NULL-text docs emit no links but
  * remain ranked nodes (they still collect base mass), and links to absent
  * ids (hollow-row fixtures) drop at the node join — accounted, never
  * thrown.
  *
  * Scale shape at 100 TB: the edge relation (out-degree pre-joined) is a
  * build-once [[graft.Scratch]] artifact like d6's postings — on a cluster
  * it lives hash-bucketed by `src` on the shared FS, so each iteration
  * shuffles ONLY the 16-byte (doc_id, rank) relation to the edge
  * partitioning and the contribution aggregate map-side-combines before its
  * one exchange; edges themselves never move after the build. Each
  * iteration's plan is rebuilt from a fresh artifact read (lineage stays
  * O(1) — the relational form of Pregel's superstep barrier, where a real
  * deployment would also checkpoint the rank relation every few
  * supersteps).
  */
object Graph {

  /** Damped update constants, micro-units of the textbook d=0.85. */
  val UnitMicro = 1000000L
  val DampMicro = 850000L
  val BaseMicro = 150000L

  /** Fixed supersteps — enough for rank ordering to stabilize on the
    * fixture graphs; a deployment iterates to an L1-delta stop instead.
    */
  val Iters = 8

  /** Content-hash divisors: one out-link per divisor (3 per document). */
  val LinkDivisors: Seq[Long] = Seq(1L, 7L, 49L)

  /** Artifact format tag — bump when the link rule or layout changes. */
  private val LinkGraphVersion = "hash60-3link-v1"

  // ---------------------------------------------------------------------
  // Core: iterate the damped update over an explicit (src, dst, deg) edge
  // relation. Both relations arrive as THUNKS returning fresh plans: each
  // superstep re-reads its inputs (artifact-backed in the gate entry), so
  // no attribute lineage is shared across iterations — the iterative
  // self-join ambiguity trap never arises and analysis cost stays flat.
  // ---------------------------------------------------------------------

  /** Integer-exact damped PageRank; returns (doc_id, rank_micro). */
  def pageRankOf(nodes: () => DataFrame, edges: () => DataFrame,
      iters: Int): DataFrame = {
    var ranks = nodes().select(col("doc_id"), lit(UnitMicro).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.withColumnRenamed("doc_id", "src")
        .join(edges(), Seq("src"))
        .select(col("dst").as("doc_id"), expr("r div deg").as("c"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("c"))
      ranks = nodes().join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr(s"${BaseMicro}L + (${DampMicro}L * coalesce(c, 0L))" +
            s" div ${UnitMicro}L").as("r"))
    }
    ranks.select(col("doc_id"), col("r").as("rank_micro"))
  }

  /** The content-derived out-edge relation with out-degree pre-joined —
    * built once per corpus (deg is a property of the build, not the
    * query; joining it at build time saves one join per superstep).
    */
  private def buildLinkGraph(spark: SparkSession, dir: String,
      out: String): Unit = {
    val docs = Catalog.documents(spark, dir)
    val n = math.max(docs.count(), 1L)
    val hashed = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("src"), TextOps.hash60(col("text")).as("h"))
    val edges = LinkDivisors
      .map(p => hashed.select(col("src"), expr(s"(h div $p) % $n").as("dst")))
      .reduce(_ unionByName _)
      .filter(col("dst") =!= col("src"))
      .distinct()
    edges.join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
  }

  private[operators] def linkGraph(spark: SparkSession, dir: String): String =
    graft.Scratch.materialize(spark, "link_graph", LinkGraphVersion, dir)(
      staging => buildLinkGraph(spark, dir, staging))

  /** Bench warmup hook — the build-once artifact is offline cost. */
  def prewarmIndexes(spark: SparkSession, dir: String): Unit = {
    linkGraph(spark, dir); ()
  }

  // ---------------------------------------------------------------------
  // K1 gate entry
  // ---------------------------------------------------------------------
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val idx = linkGraph(spark, dir)
    pageRankOf(
      () => Catalog.documents(spark, dir).select(col("doc_id")),
      () => spark.read.parquet(idx),
      Iters)
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror: the same supersteps unrolled as generated CTEs —
    * recursive CTEs forbid aggregates in the recursive term, and an
    * unrolled chain is the honest relational rendering of a fixed
    * superstep count anyway.
    */
  val pageRankSql: String = {
    val h = TextOps.hash60Sql("text")
    val nSub = "(SELECT n FROM nn)"
    val linkSelects = LinkDivisors
      .map(p => s"SELECT doc_id AS src, (h // $p) % $nSub AS dst FROM hashed")
      .mkString(" UNION ALL ")
    val iterCtes = (1 to Iters).map { i =>
      s"""r$i AS (SELECT d.doc_id,
         | CAST($BaseMicro + ($DampMicro * COALESCE(s.c, 0)) // $UnitMicro AS BIGINT) AS r
         | FROM documents d LEFT JOIN (
         |  SELECT ew.dst AS doc_id, CAST(sum(p.r // ew.deg) AS BIGINT) AS c
         |  FROM r${i - 1} p JOIN ew ON ew.src = p.doc_id
         |  GROUP BY ew.dst) s USING (doc_id))""".stripMargin
    }.mkString(", ")
    s"""WITH nn AS (SELECT greatest(count(*), 1) AS n FROM documents),
       |hashed AS (SELECT doc_id, $h AS h FROM documents WHERE text IS NOT NULL),
       |edges AS (SELECT DISTINCT src, dst FROM ($linkSelects) t WHERE dst <> src),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |ew AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT doc_id, CAST($UnitMicro AS BIGINT) AS r FROM documents),
       |$iterCtes
       |SELECT doc_id, r AS rank_micro FROM r$Iters ORDER BY doc_id"""
      .stripMargin.replace('\n', ' ')
  }

  val all: Seq[Q] = Seq(
    Q("k1_pagerank", pageRank, Some(pageRankSql),
      "integer-exact damped PageRank over the content-derived link graph — " +
        "8 relational supersteps (join + map-side-combined aggregate) off a " +
        "build-once edge artifact; micro-unit integer arithmetic makes the " +
        "iterated fixpoint bit-identical across engines (training-data " +
        "extension)"))
}
