package graft.tools

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for the connected-components pipeline (dev only).
  * Mimics bench context: runs the Bench warmup queries, clears the
  * cache, then stage-times the dedup_components internals.
  */
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

    // bench-equivalent warmup
    graft.SparkEntry.queries("scan_pruned")(spark, d)
      .write.format("noop").mode("overwrite").save()
    graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    for (run <- 1 to 2) {
      println(s"== run $run ==")
      val corpus = Components.ccCorpusTokens(spark, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("corpus")(corpus.count())
      val raw = Dedup.shinglesFromTokens(corpus)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("raw shingles")(raw.count())
      val sh = Dedup.cappedShingles(raw)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("capped shingles")(sh.count())
      raw.unpersist(blocking = false)
      val edges = Dedup.countJaccard(sh).filter(col("jac") >= 0.8)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("edges (countJaccard)")(edges.count())
      val verts = corpus.select(col("doc_id").as("v"))
      val labels = time("CC loop")(
        Components.connectedComponents(verts, edges))
      time("output write")(
        labels.select(col("v").as("doc_id"), col("component"))
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }

    time("full query (bench ctx) 1")(
      graft.SparkEntry.queries("dedup_components")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("full query (bench ctx) 2")(
      graft.SparkEntry.queries("dedup_components")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
