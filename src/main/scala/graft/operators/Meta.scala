package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode

/** Management-statement surface — SURVEY.md §2.11: SHOW TABLES, DESCRIBE,
  * EXPLAIN, DDL. All thin renderings over Spark's catalog / SQL layer
  * (the reference hand-implements these in `executor/show.go:96` and
  * `executor/explain.go:25`; Spark's catalog is the native analog).
  * DDL statements (CREATE/DROP DATABASE/TABLE, ALTER) pass through
  * `spark.sql` — exercised in MetaSpec against a temp warehouse.
  */
object Meta extends QueryModule {

  /** Register the driver tables as temp views (prefix avoids collisions
    * with anything else registered on the shared session).
    */
  def registerAll(s: SparkSession, dir: String, prefix: String = "graft_"): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.loadEvents(s, dir)
        else Tables.load(s, dir, n)
      df.createOrReplaceTempView(s"$prefix$n")
    }

  /** SHOW TABLES as a DataFrame — `catalog.listTables()` is already a
    * Dataset, so the rendering stays declarative (no driver collect).
    */
  def showTables(s: SparkSession, prefix: String = "graft_"): DataFrame = {
    import org.apache.spark.sql.functions._
    s.catalog.listTables()
      .filter(col("name").startsWith(prefix))
      .select(expr(s"substring(name, ${prefix.length + 1})").as("table_name"))
      .orderBy("table_name")
  }

  /** DESCRIBE: column name/type pairs from the schema. */
  def describe(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      .toDF("col_name", "data_type")
  }

  /** EXPLAIN FORMATTED rendering of the physical plan. */
  def explainFormatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Normalized plan shape for golden-snapshot tests: operator tree with
    * node names only — no expression ids, paths, or size estimates — the
    * analog of the reference's golden physical-plan strings
    * (`planner/core/testdata/plan_suite_out.json`).
    */
  def planShape(df: DataFrame): String = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan,
        depth: Int): Seq[String] =
      ("  " * depth + p.nodeName.trim) +: p.children.flatMap(walk(_, depth + 1))
    walk(df.queryExecution.sparkPlan, 0).mkString("\n")
  }

  override val queries: Seq[Q] = Seq(
    Q("catalog_tables",
      (s, d) => { registerAll(s, d); showTables(s) },
      Some("""SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),
                ('events'),('lineitem'),('nation'),('orders'),('part'),
                ('region'),('supplier')) t(table_name)"""))
  )
}
