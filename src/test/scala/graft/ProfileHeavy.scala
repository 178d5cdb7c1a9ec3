package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase profiler for the two heaviest steady-state queries
  * (r15 verdict item 5): `dedup_components` and `pipeline_corpus` have
  * led every comparator since r9, and the r15 DDL-swap win proved a
  * structural halving can hide inside a "steady state" audited twice.
  * This main mirrors their exact staging (same persist/count
  * choreography as Components.stagedCorpusEdges and the two query
  * bodies) with a wall-clock line per phase, so the BASELINE.md
  * disposition carries measured per-phase counts instead of an argued
  * plan audit. Test scope: a profiling harness, not part of the
  * shipped engine.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt -batch "Test/runMain graft.ProfileHeavy /root/testdata/sf0.1"
  */
object ProfileHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.semanticPins(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // untimed warmup: JIT/codegen/footer first-touch, as Bench does
    operators.Dedup.warmupProbe(spark, sfDir)
    spark.catalog.clearCache()

    (1 to 2).foreach { round =>
      println(s"[prof] === round $round ===")
      // ---- shared staging (Components.stagedCorpusEdges, unrolled) ----
      val corpus = t("A corpus tokens persist+count") {
        val c = operators.Components.ccCorpusTokens(spark, sfDir)
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[prof]   corpus rows: ${c.count()}"); c
      }
      val raw = t("B raw shingles persist+count") {
        val r = operators.Dedup.shinglesFromTokens(corpus)
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[prof]   raw shingle rows: ${r.count()}"); r
      }
      val sh = t("C capped shingles persist+count") {
        val s2 = operators.Dedup.cappedShingles(raw)
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[prof]   capped shingle rows: ${s2.count()}"); s2
      }
      raw.unpersist(blocking = false)
      val edges = operators.Dedup.countJaccard(sh)
        .filter(col("jac") >= 0.8)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      // ---- dedup_components tail (D split: the edge relation's
      // materialization vs the component solve on materialized edges;
      // the production path persists inside connectedComponents — the
      // extra persist here only moves the boundary for measurement) ----
      val e2 = t("D1 edges materialize (self-join)") {
        val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[prof]   edge rows: ${e.count()}")
        e
      }
      if (sys.env.contains("GRAFT_PROF_EXPLAIN"))
        // post-AQE final plan of the dominant phase (cheap: cached)
        println(edges.queryExecution.executedPlan.toString.take(8000))
      val comp = t("D2 CC solve on materialized edges") {
        operators.Components.connectedComponents(
          corpus.select(col("doc_id").as("v")), e2)
      }
      e2.unpersist(blocking = false)
      t("E dedup_components output write") {
        noop(comp.select(col("v").as("doc_id"), col("component")))
      }
      // ---- pipeline_corpus tail (reusing the SAME staging + labels,
      // exactly as the query body does) ----
      val sel = t("F keepers+docs join+strat window") {
        val keepers = comp.select(col("component").as("doc_id")).distinct()
        val kept = Tables.load(spark, sfDir, "documents")
          .join(keepers, "doc_id")
          .select(col("doc_id"), col("lang"), col("text"),
            operators.TextOps.wsTokens(col("text")).as("n_tokens"))
          .filter(col("n_tokens") >= 40)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(md5(col("text")), col("doc_id"))
        val s3 = kept.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 50)
          .select(col("doc_id"), col("lang"), col("n_tokens"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        s3.count(); s3
      }
      t("G packSequences+lang join+write") {
        noop(operators.Sampling.packSequences(
            sel.select(col("doc_id"), col("n_tokens")), 2048, 256)
          .join(sel.select(col("doc_id"), col("lang")), "doc_id"))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
