package graft.tools

import org.apache.spark.sql.SparkSession

/** Config-A/B query profiler (dev only, r21): runs named queries under
  * extra session configs from GRAFT_CONF ("k=v;k=v") and prints
  * sec / alloc_mb / gc_ms / task-count per query — the Bench axes — so
  * a config hypothesis (e.g. per-task page-size allocation overhead)
  * is testable in isolation. GRAFT_QUERIES = comma-separated names;
  * each runs GRAFT_REPS times (default 2).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_REPS", "2").toInt
    val names = sys.env.getOrElse("GRAFT_QUERIES", "dedup_minhash_lsh")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // memoryPins first so GRAFT_CONF can still override either pin in
    // an A/B (later .config wins)
    var b = graft.Engine.memoryPins(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false"))
    sys.env.get("GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      println(s"[conf] $k = $v")
      b = b.config(k, v)
    })
    val spark = graft.Engine.semanticPins(b).getOrCreate()
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
    val taskCnt = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskCnt.incrementAndGet()
      })

    try graft.operators.Dedup.warmupProbe(spark, d)
    catch { case e: Throwable => println(s"warmup failed: $e") }
    spark.catalog.clearCache(); System.gc()

    val queryFns = graft.SparkEntry.queries
    names.foreach { n =>
      (1 to reps).foreach { rep =>
        Thread.sleep(100L)
        val tk0 = taskCnt.get(); val a0 = allocBytes()
        val g0 = gcMillis(); val t0 = System.nanoTime()
        queryFns(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150L)
        println(f"[q] $n%-24s rep$rep ${sec}%6.2f s  al ${(allocBytes() - a0) / 1000000L}%6d MB  gc ${gcMillis() - g0}%5d ms  tk ${taskCnt.get() - tk0}%5d")
        spark.catalog.clearCache(); System.gc()
      }
    }
    spark.stop()
  }
}
