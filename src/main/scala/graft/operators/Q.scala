package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalogued engine query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle statement over
  * the same parquet tables. The driver's correctness gate hash-compares the
  * two at sf0.01 (SURVEY.md §5 t2).
  *
  * ORACLE-AUTHORING RULE (r7 gate failure, x6): the driver's hash is
  * TYPE-sensitive, and DuckDB widens integer aggregates — `sum()` over
  * INT/BIGINT returns HUGEINT — so every integer `sum()` (and any other
  * aggregate whose DuckDB result type differs from the Spark side) MUST be
  * cast to the Spark-side type in the oracle SQL: `CAST(sum(…) AS BIGINT)
  * AS alias`. Identical values with differing types are a hash FAIL.
  * (`avg()` returns DOUBLE in both engines — no cast needed there.)
  */
case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object Q {
  /** Total-order presentation sort for a PROVABLY SMALL result of an
    * expensive DAG. A plain `orderBy` compiles to a range-partitioned
    * Exchange whose boundary-sampling pass re-executes the whole child
    * plan once before the real pass — on d4 that sampling pass doubled
    * the query (3.6 s → 1.7 s at sf0.1 without it), and on n2 it re-runs
    * the quadratic verify join. Routing the tiny result through ONE
    * round-robin shuffle partition keeps the upstream at full
    * parallelism, sorts once, and never re-executes. Use ONLY where the
    * result is small by construction (thresholded near-dup pair sets,
    * accounting rows) — a large result wants the scalable range sort.
    */
  def tinySort(df: org.apache.spark.sql.DataFrame,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Pinned as-of instant mid-way through the events horizon — stands in for
    * `now()` in the reference's activity queries (reference
    * `myapp/views.py:402,405,414,419`); SURVEY.md §7.4 determinism rule.
    */
  val AsOfMid = "2024-01-15 12:00:00"

  /** Pinned as-of after the full events horizon (events span Jan 2024) —
    * the single source of truth is [[graft.Catalog.AsOf]].
    */
  val AsOfEnd: String = graft.Catalog.AsOf
}
