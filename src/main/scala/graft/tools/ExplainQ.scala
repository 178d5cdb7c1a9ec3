package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: print the formatted physical plan of one or more declared
  * queries (the per-round plan-audit loop — check pushed filters,
  * exchange keys, broadcast sides, WholeStageCodegen spans).
  *
  *   sbt "runMain graft.tools.ExplainQ ngram_novelty ann_lsh_bucketed"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
  *
  * CAVEAT: driver-assembled queries (stats_cm_freq, stats_topk,
  * stats_histogram — anything whose builder collects a metadata-scale
  * result and re-wraps it) EXECUTE their distributed jobs inside the
  * builder and return a LocalTableScan, so this tool prints only the
  * final local relation for them. Audit those pipelines at the source
  * (their Scaladoc documents each exchange) or by timing the stages in
  * a profiler tool instead.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"========== $name ==========")
      println(SparkEntry.queries(name)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
