package graft

import org.apache.spark.sql.SparkSession

/** Session factory: one place that owns engine-wide settings, mirroring the
  * role of the reference's session bootstrap (tinysql `session/session.go:562`
  * owns parse→optimize→execute settings per session).
  *
  * Scale posture: AQE on (runtime join-strategy switching + skew-join +
  * partition coalescing replaces the reference's cost-based copTask sizing,
  * `planner/core/task.go:80-115`), shuffle partitions sized to cores for
  * local mode (a real cluster would use dynamic AQE coalescing from a larger
  * initial number).
  */
object Engine {
  def session(cores: Int = 32, app: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ANSI on (Spark 4 default, pinned): arithmetic overflow raises,
      // matching the reference's error-on-overflow
      // (`expression/builtin_arithmetic.go`); MySQL's div-by-zero→NULL
      // is routed through try_divide/nullif guards instead (SURVEY §7.3).
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cost-based planning on engine-wide (the reference always plans with
    // stats when present, `planner/core/stats.go`)
    Stats.enableCbo(spark)
    spark
  }
}
