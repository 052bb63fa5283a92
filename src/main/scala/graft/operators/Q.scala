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
