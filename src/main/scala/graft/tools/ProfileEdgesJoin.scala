package graft.tools

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler (dev only): paired A/B timing of the shingle-edges
  * self-join — the suite's heaviest stage (r19 ProfileHeavy: 3.3 s
  * steady-state inside pipeline_corpus / dedup_components) — under its
  * current SortMergeJoin shape vs a SHUFFLE_HASH-hinted variant
  * (guide §3.1: post-cap df ≤ maxShingleDf bounds every build
  * partition, so the SHJ OOM risk is bounded by construction).
  *
  * The two variants alternate inside ONE JVM over the SAME persisted
  * capped-shingle input, with the run ORDER alternating per rep (a
  * settling host otherwise biases whichever arm runs second); only the
  * paired deltas are meaningful, never the absolute seconds.
  *
  * r20 RESULT — measured and REJECTED: in a healthy window the two
  * strategies are equal within noise (edges median off 2.17 s vs
  * 128m-threshold 2.29 s, both arms 1.90–2.29 s across 6 reps; full
  * dedup_components medians equal within window variance), while a
  * degraded-window session had read SHJ 0.61x — a storm artifact, the
  * SMJ arm caught the storms. No reliable win + SHJ's non-spilling
  * per-partition build weakens the 100 TB posture = SMJ stays.
  * Gotcha worth keeping: after a noop write, df.queryExecution is a
  * SEPARATE never-executed QueryExecution — read the final adaptive
  * plan from the df's own collect(), or the probe reports the
  * unexecuted initial plan.
  */
object ProfileEdgesJoin {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label%-24s $s%.2f s"); s
    }

    // same staging as stagedCorpusEdges, persisted once for all reps
    val corpus = Components.ccCorpusTokens(spark, d)
      .persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val raw = Dedup.shinglesFromTokens(corpus)
      .persist(StorageLevel.MEMORY_AND_DISK)
    raw.count()
    val sh = Dedup.cappedShingles(raw).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    raw.unpersist(blocking = false)

    // Unhinted arm = the PRODUCTION definition (ADVICE r20: a hand
    // copy here could silently drift from countJaccard and measure a
    // different relation); only the hinted twin is hand-built, and its
    // body must mirror Dedup.countJaccard line for line.
    def edgesOff: DataFrame = Dedup.countJaccard(sh)
      .filter(col("jac") >= 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    def edgesHinted: DataFrame = {
      val b = sh.hint("shuffle_hash")
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val common = sh.as("a")
        .join(b.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
      common
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jac"))
        .filter(col("jac") >= 0.8)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    }
    // Label check counts JOIN NODES per strategy instead of a bare
    // contains() (ADVICE r20: the sizes joins are always SortMergeJoin
    // at this stats shape, so contains("SortMergeJoin") could print
    // "SMJ" even if the shingle self-join were not); the shingle join
    // flipping SMJ→SHJ shows up as the count moving, and these are
    // pre-execution sparkPlans (initial under AQE — the executed-plan
    // probe below is the authoritative one).
    def joinCounts(df: DataFrame): String = {
      val p = df.queryExecution.sparkPlan.toString
      Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .map(n => s"$n×${n.r.findAllIn(p).size}").mkString(" ")
    }
    println("[prof] initial plan (off):    " + joinCounts(edgesOff))
    println("[prof] initial plan (hinted): " + joinCounts(edgesHinted))

    // A/B the AQE runtime rewrite (maxShuffledHashJoinLocalMapThreshold)
    // on the UNHINTED plan: same declarative SMJ, AQE converts to SHJ
    // when every post-shuffle partition is under the threshold. The
    // final plan is read from the df's OWN execution (collect), not a
    // write — a noop save spawns a separate QueryExecution and the
    // df's executedPlan would print the unexecuted initial plan.
    val K = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    def joinNodes(df: DataFrame): String = {
      // execute through the df's own QueryExecution WITHOUT pulling the
      // relation to the driver (ADVICE r20: collect() of the full edge
      // relation OOMs the driver if SPARK_GRAFT_SF_DIR points at a
      // larger scale) — foreach materializes executor-side only and
      // still finalizes the adaptive executedPlan
      df.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .map(n => s"$n×${n.r.findAllIn(p).size}").mkString(" ")
    }
    spark.conf.set(K, "0")
    println("[prof] executed joins (off):  " + joinNodes(edgesOff))
    spark.conf.set(K, "128m")
    println("[prof] executed joins (128m): " + joinNodes(edgesOff))

    // paired timing with ALTERNATING order (odd reps run off first,
    // even reps run 128m first) so a settling host cannot bias one arm.
    // med: true median — the two middle values AVERAGE on even n
    // (ADVICE r20: the upper-middle pick positionally biased every
    // even-rep-count reading in the r20 notes)
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    var (ta, tb) = (List.empty[Double], List.empty[Double])
    def runOff(rep: Int) = { spark.conf.set(K, "0")
      ta ::= time(s"edges off  rep$rep") {
        edgesOff.write.format("noop").mode("overwrite").save() } }
    def run128(rep: Int) = { spark.conf.set(K, "128m")
      tb ::= time(s"edges 128m rep$rep") {
        edgesOff.write.format("noop").mode("overwrite").save() } }
    for (rep <- 1 to 6) {
      if (rep % 2 == 1) { runOff(rep); run128(rep) }
      else { run128(rep); runOff(rep) }
    }
    println(f"[prof] median off ${med(ta)}%.2f s  128m ${med(tb)}%.2f s  " +
      f"ratio ${med(tb) / med(ta)}%.2f")

    // full-query effect, paired, alternating, fresh caches per rep
    def full(label: String): Double = time(label) {
      graft.SparkEntry.queries("dedup_components")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    corpus.unpersist(blocking = true); sh.unpersist(blocking = true)
    var (fa, fb) = (List.empty[Double], List.empty[Double])
    def fullOff(rep: Int) = { spark.conf.set(K, "0")
      spark.catalog.clearCache(); fa ::= full(s"dedup_components off  rep$rep") }
    def full128(rep: Int) = { spark.conf.set(K, "128m")
      spark.catalog.clearCache(); fb ::= full(s"dedup_components 128m rep$rep") }
    for (rep <- 1 to 4) {
      if (rep % 2 == 1) { fullOff(rep); full128(rep) }
      else { full128(rep); fullOff(rep) }
    }
    println(f"[prof] full median off ${med(fa)}%.2f s  128m ${med(fb)}%.2f s  " +
      f"ratio ${med(fb) / med(fa)}%.2f")
    spark.stop()
  }
}
