package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Dev-only audit: dump every parquet-scan DataFilter and FilterExec
  * condition across the whole query surface that contains an
  * EXPENSIVE expression marker (HOFs, hashes, n-gram assembly) — the
  * generalization of the PlanShapeSpec tokenize sweep, for manual
  * review. A hit is not automatically a defect (a predicate that is
  * ONLY a predicate evaluates once wherever it sits — e.g. the md5
  * sampling membership filters); the duplication class needs the same
  * expression to also be projected. The tokenize family is the one
  * with a mechanical no-hit contract; this probe exists to eyeball
  * the rest.
  */
object ProbeFilters {
  private val Markers = Seq("regexp_extract_all", "transform(",
    "sequence(", "xxhash64", "md5(", "sha2", "aggregate(", "filter(",
    "zip_with", "sentences(")

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(name: String, p: SparkPlan): Unit = {
      p.foreach {
        case sc: FileSourceScanExec =>
          sc.dataFilters.foreach { f =>
            val s = f.toString
            Markers.filter(s.contains).foreach(m =>
              println(s"[scan-filter] $name marker=$m :: ${s.take(200)}"))
          }
        case f: FilterExec =>
          val s = f.condition.toString
          Markers.filter(s.contains).foreach(m =>
            println(s"[filter-exec] $name marker=$m :: ${s.take(200)}"))
        case _ =>
      }
    }
    val queryFns = graft.SparkEntry.queries
    graft.SparkEntry.selectNames(None).foreach { n =>
      try {
        val qe = queryFns(n)(spark, d).queryExecution
        sweep(n, qe.sparkPlan)
        qe.optimizedPlan.collectWithSubqueries {
          case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
              if r.isInstanceOf[InMemoryRelation] =>
            sweep(n + "(cached)", r.asInstanceOf[InMemoryRelation].cachedPlan)
        }
      } catch { case e: Throwable =>
        println(s"[plan-fail] $n: ${e.getMessage}")
      }
    }
    println("[probe-filters] done")
    spark.stop()
  }
}
