package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for raw scheduler/stage overhead (dev only).
  *
  * Times three fixed shapes many times in one JVM so host regimes can
  * be compared apples-to-apples (see BASELINE.md r10 measurement
  * notes): a 1-stage 32-task job, a 2-stage shuffle job, and a
  * 5-stage chain. Work per task is trivial, so the time IS dispatch +
  * stage-boundary overhead. Prints per-iteration seconds; the spread
  * between warm iterations of the same shape is the host's scheduling
  * jitter, and the warm floor is the per-stage cost a many-stage
  * query pays dozens of times.
  */
object ProbeSched {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"[sched] $label%-18s warm-min ${s.head}%.3f  p50 ${s(n / 2)}%.3f  max ${s.last}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val oneStage = spark.range(0, 32, 1, 32).select(sum(col("id")))
    val twoStage = spark.range(0, 1024, 1, 32)
      .groupBy(col("id") % 7).count().select(sum(col("count")))
    // val, not def: a def would rebuild the frame each timed iteration
    // and fold fresh plan analysis + codegen into exactly the dispatch
    // overhead this tool isolates (the 1-/2-stage shapes are vals too)
    val chain = (1 to 4).foldLeft(spark.range(0, 1024, 1, 32).toDF("id")) {
      (df, i) => df.groupBy((col("id") + i) % (7 + i)).agg(
        sum(col("id")).as("id")).select(col("id"))
    }.select(sum(col("id")))

    run("1-stage/32-task", 10)(oneStage.collect())
    run("2-stage shuffle", 10)(twoStage.collect())
    run("5-stage chain", 10)(chain.collect())
    spark.stop()
  }
}
