package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for dedup_delta's stages (dev only): times each
  * materialization separately to localize the 32-thread slowdown seen in
  * the round-9 driver-replica bench (17 s at 32 cpus vs 5 s at 8).
  */
object ProfileDelta {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores)
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = Tables.load(spark, d, "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val btoks = Dedup.tokens(base).persist(StorageLevel.MEMORY_AND_DISK)
    time("btoks count")(btoks.count())
    val batchToks = Dedup.deltaBatchToks(btoks)
    val batch = Dedup.deltaBatchDocs(base, btoks)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("batch count")(batch.count())
    val exact = batch.as("b")
      .join(base.as("e"), md5(col("b.text")) === md5(col("e.text")))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(min(col("e.doc_id")).as("em"))
    time("exact count")(exact.count())
    // mirror the production staging exactly (rawAll persisted and
    // counted BEFORE the cap, then freed) — r9 changed the query's
    // choreography and a profiler that skips the rawAll stage no longer
    // times what production runs
    val rawAll = Dedup.shinglesFromTokens(btoks.unionByName(batchToks))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("rawAll count")(rawAll.count())
    val shAll = Dedup.cappedShingles(rawAll)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shAll count")(shAll.count())
    rawAll.unpersist(blocking = false)
    val sizes = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = shAll.filter(col("doc_id") >= 1000000L).as("nb")
      .join(shAll.filter(col("doc_id") < 1000000L).as("eb"),
        col("nb.s") === col("eb.s"))
      .groupBy(col("nb.doc_id").as("bid"), col("eb.doc_id").as("eid"))
      .agg(count(lit(1)).as("c"))
    time("common count")(common.count())
    val near = common
      .join(sizes.as("sa"), col("bid") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("eid") === col("sb.doc_id"))
      .filter(col("c") / (col("sa.n") + col("sb.n") - col("c")) >= 0.8)
      .groupBy(col("bid").as("doc_id")).agg(min(col("eid")).as("nm"))
    time("near count")(near.count())
    val out = batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("em").isNotNull, "exact")
          .when(col("nm").isNotNull, "near")
          .otherwise("new").as("verdict"),
        coalesce(col("em"), col("nm"), lit(-1L)).as("match_id"))
    time("out noop write")(
      out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
