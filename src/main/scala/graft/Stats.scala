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
    * 254 in Spark vs 256 in the reference).
    */
  def analyze(spark: SparkSession, table: String): Unit = {
    enableCbo(spark)
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  /** Row count from catalog stats (None if the table was never analyzed). */
  def rowCount(spark: SparkSession, table: String): Option[BigInt] = {
    val rel = spark.table(table).queryExecution.optimizedPlan
    rel.stats.rowCount
  }
}
