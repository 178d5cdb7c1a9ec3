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

  /** SEMANTIC pins shared by every entrypoint that builds its own
    * session (Bench and Verify hand-roll builders deliberately — no
    * CBO so the timed/dumped plans match the driver contract, their
    * own shuffle sizing — but semantics must not ride Spark defaults):
    * ANSI on (Spark 4 default, pinned: arithmetic overflow raises,
    * matching the reference's error-on-overflow,
    * `expression/builtin_arithmetic.go`; MySQL's div-by-zero→NULL is
    * routed through try_divide guards instead, SURVEY §7.3) and the
    * UTC session timezone the fixtures assume. A spark-defaults.conf
    * flipping ansi off used to silently change the GATE runs' cast/
    * overflow behavior while Engine-built spec sessions kept the pin.
    */
  def semanticPins(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  def session(cores: Int = 32, app: String = "graft"): SparkSession = {
    val spark = semanticPins(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cost-based planning on engine-wide (the reference always plans with
    // stats when present, `planner/core/stats.go`)
    Stats.enableCbo(spark)
    spark
  }
}
