package graft.tools

import graft.operators.Components
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch experiment (dev only): join-form vs posting-list-form shared-
  * shingle counting on the 3-copy components corpus. The join form
  * shuffles the shingle relation twice and sorts both sides; the posting
  * form shuffles it once into per-shingle doc lists and explodes ordered
  * pairs map-side (bounded by the df cap).
  */
object ProfileJaccard {
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

    val corpus = Components.ccCorpusTokens(spark, d)
    val sh = graft.operators.Dedup.cappedShingles(
      graft.operators.Dedup.shinglesFromTokens(corpus))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shingles materialize")(println("  sh rows = " + sh.count()))

    def tail(common: org.apache.spark.sql.DataFrame) = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      common
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jac"))
        .filter(col("jac") >= 0.8)
    }

    val joinCommon = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))

    val postCommon = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(" +
          "slice(ds, i + 2, size(ds)), " +
          "y -> named_struct('doc_a', x, 'doc_b', y))))")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("c"))

    for (round <- 1 to 2) {
      time(s"join form $round")(
        tail(joinCommon).write.format("noop").mode("overwrite").save())
      time(s"posting form $round")(
        tail(postCommon).write.format("noop").mode("overwrite").save())
    }
    val a = tail(joinCommon).select("doc_a", "doc_b")
    val b = tail(postCommon).select("doc_a", "doc_b")
    println("  diff = " + a.exceptAll(b).count() + " / "
      + b.exceptAll(a).count())
    spark.stop()
  }
}
