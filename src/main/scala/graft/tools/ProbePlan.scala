package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: count shuffle exchanges in the shingle-staging plans. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val sh = graft.operators.Dedup.shingles(
      graft.operators.Dedup.corpus(spark, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count()
    val capped = graft.operators.Dedup.cappedShingles(sh)
    capped.collect()
    println("CAPPED_EXCH " + "Exchange hashpartitioning".r
      .findAllIn(capped.queryExecution.executedPlan.toString).length)
    val jac = graft.operators.Dedup.countJaccard(capped)
      .filter(col("jac") >= 0.8)
    jac.collect()
    val p = jac.queryExecution.executedPlan.toString
    println("JAC_EXCH " + "Exchange hashpartitioning".r.findAllIn(p).length)
    println(p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .mkString("\n"))
    spark.stop()
  }
}
