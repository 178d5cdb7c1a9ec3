package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the training-data-pipeline extensions); `oracleSql` the DuckDB
  * twin the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All operator modules, in SURVEY §2 order. */
  private def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Expressions,
    operators.Dml,
    operators.EventsOps,
    operators.TextOps,
    operators.Dedup,
    operators.Similarity,
    operators.Multimodal,
    operators.Meta,
    operators.SqlSurface,
    operators.Indexing,
    operators.SketchOps,
    operators.Skew,
    operators.Components,
    operators.Sampling,
    operators.Analytic,
    operators.Curation,
    operators.PipelineOps,
    operators.CorpusOps,
    operators.Formats)

  private lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    // fail fast on a name collision: queries.toMap would silently keep
    // the last entry while selectNames listed the name twice, so Bench
    // and Verify would run the SHADOWING query twice under one name and
    // the hash gate would never notice
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "join_multiway").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** Query names selected by an optional comma-separated filter (the
    * SPARK_GRAFT_ONLY env contract shared by Bench and Verify); None =
    * all. An empty or unknown filter aborts — silently running zero
    * queries would print a plausible all-green/0-sec result.
    */
  def selectNames(filter: Option[String]): Seq[String] = {
    val names = all.map(_.name).sorted
    filter match {
      case None => names
      case Some(v) =>
        val only = v.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = only -- names.toSet
        require(only.nonEmpty, s"SPARK_GRAFT_ONLY selects no queries: '$v'")
        // name the offending entries: a one-typo filter among valid
        // names used to claim the WHOLE filter matched nothing
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY has unknown quer${
            if (unknown.size == 1) "y" else "ies"}: ${
            unknown.toSeq.sorted.mkString(", ")}")
        names.filter(only)
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
