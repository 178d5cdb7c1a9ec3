package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: print the formatted physical plan of one or more declared
  * queries (the per-round plan-audit loop — check pushed filters,
  * exchange keys, broadcast sides, WholeStageCodegen spans).
  *
  *   sbt "runMain graft.tools.ExplainQ ngram_novelty ann_lsh_bucketed"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
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
