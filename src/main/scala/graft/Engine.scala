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

  /** MEMORY-FOOTPRINT pins (r21, guide §5), shared by every entrypoint
    * next to [[semanticPins]]. Plan-neutral — neither changes any
    * result or any plan shape; both cut the per-task fixed allocation
    * that dominated the dedup heavy tail's 8-13 GB/query footprint at
    * sf0.1 (JFR-attributed: execution-memory pages + per-reducer
    * shuffle streams), the exact signature that collapsed the
    * 32-thread driver window six rounds running.
    *
    *   - `spark.buffer.pageSize`: the default derives from
    *     heap/cores (≈16 MB here), and every sort/aggregation/join
    *     operator allocates (and the JVM zeroes) at least one page per
    *     task — ~10 MB × ~800 tasks of pure overhead per heavy query
    *     at sf0.1. 1m keeps a task's first page proportionate to its
    *     actual state; a 100 TB deployment with multi-GB per-task
    *     state should raise it (8m+; pages chain, and the serialized
    *     shuffle's PackedRecordPointer addresses 8192 pages, so 1m
    *     still spans 8 GB of sort state per consumer before spilling).
    *     Env-overridable so that cluster posture needs no code change.
    *   - `spark.shuffle.sort.bypassMergeThreshold=2`: below the
    *     threshold the bypass writer opens one buffered LZ4 stream PER
    *     REDUCER per map task (32 streams × ~100 KB buffers here);
    *     above it the serialized sort writer streams one file per
    *     task. A real cluster runs with reducer counts far above the
    *     default 200, so the sort path IS the at-scale path — this pin
    *     makes local execution exercise it too (measured: the dedup
    *     heavy tail's biggest single wall-clock cut this round).
    */
  def memoryPins(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.buffer.pageSize",
        sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "1m"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "2"))
      // the sort-path writer still opens one LZ4 stream per PARTITION
      // SEGMENT (writeSortedFile's commitAndGet per boundary), each
      // allocating 2×blockSize buffers — JFR-attributed at ~1.9 GB per
      // heavy query at the 32k default. 8k keeps the churn ∝ segments
      // bounded; a 100 TB deployment whose shuffles are network-bound
      // should prefer the default-or-larger block for compression
      // ratio (env-overridable, same posture as the page size).
      .config("spark.io.compression.lz4.blockSize",
        sys.env.getOrElse("SPARK_GRAFT_LZ4_BLOCK", "8k"))

  def session(cores: Int = 32, app: String = "graft"): SparkSession = {
    val spark = memoryPins(semanticPins(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cost-based planning on engine-wide (the reference always plans with
    // stats when present, `planner/core/stats.go`)
    Stats.enableCbo(spark)
    spark
  }
}
