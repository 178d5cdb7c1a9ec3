package graft

import org.apache.spark.sql.SparkSession

/** ANALYZE / statistics / CBO wrapper — the Spark-native analog of the
  * reference's stats subsystem: `executor/analyze.go:44` builds per-column
  * equi-depth histograms (`statistics/histogram.go:79`) and sketches that
  * feed selectivity estimation (`statistics/selectivity.go`) and the
  * cost-based join reorder (`planner/core/rule_join_reorder.go`).
  *
  * In Spark the same machinery is Catalyst's CBO: ANALYZE TABLE computes
  * row counts + per-column NDV/min/max (and equi-height histograms when
  * `spark.sql.statistics.histogram.enabled` is on), and
  * `spark.sql.cbo.joinReorder.enabled` turns on cost-based join reorder.
  */
object Stats {

  /** Turn on CBO + histogram collection for the session. Idempotent. */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
  }

  /** ANALYZE TABLE t: table-level stats + per-column stats/histograms
    * (the analog of `ANALYZE TABLE ... COMPUTE STATISTICS` in the
    * reference, `executor/analyze.go:44-62` — histogram buckets default
    * 254 in Spark vs 256 in the reference). Histogram collection is
    * enabled only for the duration of the ANALYZE — running a statement
    * must not silently flip session-global optimizer behavior; turning
    * CBO on is an explicit engine decision ([[enableCbo]], called from
    * Engine.session).
    */
  def analyze(spark: SparkSession, table: String): Unit = {
    val key = "spark.sql.statistics.histogram.enabled"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      // ONE statement: the FOR ALL COLUMNS pass computes and persists
      // the table-level sizeInBytes/rowCount along with the column
      // stats (AnalyzeColumnCommand), so a preceding bare COMPUTE
      // STATISTICS was a second full-table scan whose results were
      // immediately superseded
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Row count from catalog stats (None if the table was never analyzed).
    * Read from the catalog metadata directly — plan-level `stats.rowCount`
    * is only populated when CBO is enabled on the session.
    */
  def rowCount(spark: SparkSession, table: String): Option[BigInt] = {
    // parse with the SQL parser, not split('.'): a backtick-quoted part
    // containing a dot (`my.table`) split naively into garbage (db
    // "`my") and silently reported None — indistinguishable from
    // never-analyzed. Last two parts name the (db, table) in the
    // session catalog (a catalog-qualified 3-part name previously fell
    // through whole into TableIdentifier and threw); unknown/temp/
    // unparseable names return None (the documented contract).
    val parts = scala.util.Try(
      spark.sessionState.sqlParser.parseMultipartIdentifier(table))
      .getOrElse(Seq(table))
    val ident =
      if (parts.length >= 2)
        org.apache.spark.sql.catalyst.TableIdentifier(
          parts(parts.length - 1), Some(parts(parts.length - 2)))
      else org.apache.spark.sql.catalyst.TableIdentifier(parts.head)
    scala.util.Try(spark.sessionState.catalog.getTableMetadata(ident))
      .toOption.flatMap(_.stats).flatMap(_.rowCount)
  }
}
