package graft.tools

import graft.operators.Components
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for the connected-components pipeline (dev only). */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpus = Components.ccCorpus(spark, d)
    time("corpus count")(println("  corpus rows = " + corpus.count()))
    val edges = Components.jaccardEdges(corpus)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("edges materialize")(println("  edges = " + edges.count()))
    val verts = corpus.select(col("doc_id").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("verts materialize")(verts.count())

    // inline copy of the CC loop (localCheckpoint form, as the operator)
    // with per-round timing
    val sym = edges.select(col("src").as("u"), col("dst").as("w"))
      .union(edges.select(col("dst").as("u"), col("src").as("w")))
    var labels = verts.select(col("v"), col("v").as("component"))
      .localCheckpoint()
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("component"))).head.getLong(0)
    var cur = time("round 0 labelSum")(labelSum(labels))
    var converged = false
    var rounds = 0
    while (!converged && rounds < 25) {
      val viaNeighbors = sym.join(labels, col("w") === col("v"))
        .select(col("u").as("v"), col("component"))
      val next = labels.select(col("v"), col("component"))
        .union(viaNeighbors)
        .groupBy(col("v")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      val nextSum = time(s"round ${rounds + 1}")(labelSum(next))
      labels = next
      converged = nextSum == cur
      cur = nextSum
      rounds += 1
    }
    println(s"[prof] rounds = $rounds")
    time("full query (bench-like)")(
      graft.SparkEntry.queries("dedup_components")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
