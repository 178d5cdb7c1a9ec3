package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for the minhash-LSH pipeline stages (dev only). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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

    val docs = Tables.load(spark, d, "documents")
    val norm = docs.select(col("doc_id"), lower(col("text")).as("text"))
    val corpus = norm.unionByName(
      norm.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    // PRODUCTION staging (ADVICE r20 drift rule: a hand copy here once
    // measured the retired string-shingle pipeline instead of the real
    // one) — Dedup.shingles is the definition every dedup query runs
    val sh = graft.operators.Dedup.shingles(corpus)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shingles materialize")(sh.count())

    val mins = (0 until 32).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())

    val bands = (0 until 8).map(b => struct(
      lit(b).as("band"),
      xxhash64((b * 4 until b * 4 + 4).map(i => col(s"h$i")): _*).as("key")))
    val buckets = sig
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("buckets materialize")(buckets.count())

    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidates materialize")(cand.count())

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
    val fin = cand.join(scored, Seq("doc_a", "doc_b"))
      .filter(col("jac") >= 0.7)
    time("verify+final")(fin.write.format("noop").mode("overwrite").save())
    time("verify+final 2nd")(fin.write.format("noop").mode("overwrite").save())
    val sh2 = graft.operators.Dedup.shingles(corpus)
    time("shingles 2nd (no persist)")(sh2.write.format("noop").mode("overwrite").save())
    val sig2 = sh2.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("signatures 2nd")(sig2.write.format("noop").mode("overwrite").save())

    spark.catalog.clearCache()
    time("full query (bench-like) 1")(
      graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("full query (bench-like) 2")(
      graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
