package graft.tools

import graft.Tables
import graft.operators.{Components, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level allocation profiler for the dedup heavy tail (dev only,
  * r21): attributes each query's alloc_mb (the Bench axis) to its
  * pipeline stages so the §5 rewrite targets the stage that actually
  * allocates, not the one that looks expensive. Same measurement
  * methodology as Bench.materialize: ThreadMXBean allocated-bytes delta
  * + gc delta + task-count delta around a noop write, clearCache +
  * System.gc() between stages.
  *
  * DRIFT WARNING (the ADVICE r20 rule): stage isolation requires
  * hand-copying pipeline fragments (the minhash signature/band/verify
  * stages below mirror Dedup.scala's dedup_minhash_lsh body; the
  * delta stages mirror dedup_delta's). If a production stage changes,
  * update the copy here or the profiler measures a different pipeline
  * — the FULL-query stages at each section's end run the real
  * SparkEntry query and act as the cross-check (a copy that drifts
  * shows up as stage times that no longer add up to the full query).
  */
object ProfileAllocStages {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.semanticPins(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val threadMx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    if (!threadMx.isThreadAllocatedMemoryEnabled)
      threadMx.setThreadAllocatedMemoryEnabled(true)
    def allocBytes(): Long =
      threadMx.getThreadAllocatedBytes(threadMx.getAllThreadIds)
        .filter(_ > 0).sum
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    def stage[T](label: String)(f: => T): T = {
      Thread.sleep(50L)
      val a0 = allocBytes(); val g0 = gcMillis(); val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50L)
      val al = (allocBytes() - a0) / 1000000L
      val gc = gcMillis() - g0
      println(f"[alloc] $label%-36s ${sec}%7.2f s  al ${al}%6d MB  gc ${gc}%5d ms")
      r
    }
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def reset(): Unit = { spark.catalog.clearCache(); System.gc() }

    // warmup (codegen/JIT first-touch, parquet footers)
    try Dedup.warmupProbe(spark, d)
    catch { case e: Throwable => println(s"warmup failed: $e") }
    reset()

    println("=== dedup_minhash_lsh stages ===")
    locally {
      val corpus = Dedup.corpus(spark, d)
      // stage 1: tokenize only (fan-out + regexp), no shingle hash
      stage("tokenize (repartition+regexp)")(run(
        corpus.repartition(col("doc_id"))
          .select(col("doc_id"),
            regexp_extract_all(col("text"),
              lit(graft.operators.TextOps.NonWsToken), lit(0)).as("t"))))
      reset()
      // stage 2: tokenize + shingle hash HOF + explode (no distinct)
      stage("+shingle HOF explode (no distinct)")(run(
        corpus.repartition(col("doc_id"))
          .select(col("doc_id"),
            regexp_extract_all(col("text"),
              lit(graft.operators.TextOps.NonWsToken), lit(0)).as("t"))
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t)-3), " +
              "i -> xxhash64(t[i], t[i+1], t[i+2])) " +
              "ELSE CAST(array() AS ARRAY<BIGINT>) END")).as("s"))))
      reset()
      // stage 3: full shingles() incl distinct, materialized to cache
      val sh = Dedup.shingles(Dedup.corpus(spark, d))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("shingles +distinct +persist count")(sh.count())
      // stage 4: 32-min signature over the cached shingles
      val mins = (0 until 32).map(i =>
        min(xxhash64(lit(i), col("s"))).as(s"h$i"))
      val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      stage("minhash signature (32 aggs)")(run(sig))
      // stage 5: band explode + persist
      val bands = (0 until 8).map(b => struct(
        lit(b).as("band"),
        xxhash64((b * 4 until b * 4 + 4).map(i => col(s"h$i")): _*).as("key")))
      val buckets = sig
        .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.key").as("key"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("buckets persist count")(buckets.count())
      val cand = buckets.as("x")
        .join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("candidates persist count")(cand.count())
      // stage 6: verify (candidateJaccard equivalent)
      val docsC = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b"))).distinct()
      val shC = sh.join(docsC, "doc_id")
      val sizes = shC.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val common = shC.as("a")
        .join(shC.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
      val scored = common
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jac"))
      stage("verify (candidateJaccard)")(run(
        cand.join(scored, Seq("doc_a", "doc_b")).filter(col("jac") >= 0.7)))
      reset()
      stage("FULL dedup_minhash_lsh")(run(
        graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d)))
      reset()
    }

    println("=== dedup_components / pipeline_corpus stages ===")
    locally {
      val corpus = Components.ccCorpusTokens(spark, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("ccCorpusTokens persist count")(corpus.count())
      val raw = Dedup.shinglesFromTokens(corpus)
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("shinglesFromTokens persist count")(raw.count())
      val sh = Dedup.cappedShingles(raw).persist(StorageLevel.MEMORY_AND_DISK)
      stage("cappedShingles persist count")(sh.count())
      raw.unpersist(blocking = false)
      val edges = Dedup.countJaccard(sh).filter(col("jac") >= 0.8)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("edges (countJaccard >= .8)")(edges.count())
      val verts = corpus.select(col("doc_id").as("v"))
      stage("connectedComponents")(run(
        Components.connectedComponents(verts, edges)))
      reset()
      stage("FULL dedup_components")(run(
        graft.SparkEntry.queries("dedup_components")(spark, d)))
      reset()
      stage("FULL pipeline_corpus")(run(
        graft.SparkEntry.queries("pipeline_corpus")(spark, d)))
      reset()
    }

    println("=== dedup_delta stages ===")
    locally {
      val base = Tables.load(spark, d, "documents")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val btoks = Dedup.tokens(base).persist(StorageLevel.MEMORY_AND_DISK)
      stage("btoks persist count")(btoks.count())
      val batchToks = Dedup.deltaBatchToks(btoks)
      val batch = Dedup.deltaBatchDocs(base, btoks)
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("batch docs persist count")(batch.count())
      val exact = batch.as("b")
        .join(base.as("e"), md5(col("b.text")) === md5(col("e.text")))
        .groupBy(col("b.doc_id").as("doc_id"))
        .agg(min(col("e.doc_id")).as("em"))
      stage("exact join")(run(exact))
      val rawAll = Dedup.shinglesFromTokens(btoks.unionByName(batchToks))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("rawAll shingles persist count")(rawAll.count())
      val shAll = Dedup.cappedShingles(rawAll)
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("cappedShingles persist count")(shAll.count())
      rawAll.unpersist(blocking = false)
      val sizes = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val common = shAll.filter(col("doc_id") >= 1000000L).as("nb")
        .join(shAll.filter(col("doc_id") < 1000000L).as("eb"),
          col("nb.s") === col("eb.s"))
        .groupBy(col("nb.doc_id").as("bid"), col("eb.doc_id").as("eid"))
        .agg(count(lit(1)).as("c"))
      val near = common
        .join(sizes.as("sa"), col("bid") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("eid") === col("sb.doc_id"))
        .filter(col("c") / (col("sa.n") + col("sb.n") - col("c")) >= 0.8)
        .groupBy(col("bid").as("doc_id")).agg(min(col("eid")).as("nm"))
      stage("near (cross-set jaccard)")(run(near))
      reset()
      stage("FULL dedup_delta")(run(
        graft.SparkEntry.queries("dedup_delta")(spark, d)))
      reset()
    }

    println("=== ann_ivf stages ===")
    locally {
      stage("FULL ann_ivf (1st)")(run(
        graft.SparkEntry.queries("ann_ivf")(spark, d)))
      reset()
      stage("FULL ann_ivf (2nd)")(run(
        graft.SparkEntry.queries("ann_ivf")(spark, d)))
      reset()
    }

    spark.stop()
  }
}
