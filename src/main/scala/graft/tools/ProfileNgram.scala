package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for the n-gram Jaccard pipeline stages (dev only). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, d, "documents")
    val norm = docs.select(col("doc_id"), lower(col("text")).as("text"))
    val corpus = norm.unionByName(
      norm.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    val shRaw = corpus.repartition(col("doc_id"))
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit(graft.operators.TextOps.NonWsToken), lit(0)).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("s_str"))
      .select(col("doc_id"), xxhash64(col("s_str")).as("s"))
      .distinct()
    val rare = shRaw.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 256).select(col("s"))
    val sh = shRaw.join(rare, "s").persist(StorageLevel.MEMORY_AND_DISK)
    time("capped shingles materialize")(sh.count())

    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    time("sizes")(sizes.write.format("noop").mode("overwrite").save())
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    time("common (self-join+agg)")(
      common.write.format("noop").mode("overwrite").save())
    val scored = common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jac"))
      .filter(col("jac") >= 0.8)
    time("scored+filter")(scored.write.format("noop").mode("overwrite").save())

    spark.catalog.clearCache()
    time("full query (bench-like) 1")(
      graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("full query (bench-like) 2")(
      graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
        .write.format("noop").mode("overwrite").save())
    println("[prof] common rows = " + common.count())
    spark.stop()
  }
}
