package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for front-end statement costs (dev only). */
object ProfileSql {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.filterNot(_ == "events").foreach(n =>
      Tables.load(spark, d, n).createOrReplaceTempView(n))
    Tables.loadEvents(spark, d).createOrReplaceTempView("events")
    val gs = new GraftSession(spark)

    def t(sql: String): Unit = {
      val t0 = System.nanoTime()
      gs.execute(sql)
      println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $sql")
    }

    // warmup round, then timed round
    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      t("CREATE DATABASE IF NOT EXISTS graft_prof")
      t("USE graft_prof")
      t("DROP TABLE IF EXISTS act")
      t("CREATE TABLE act (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR(32))")
      t("INSERT INTO act SELECT n_nationkey, n_name FROM nation")
      t("CREATE INDEX nidx ON act (n_name)")
      t("ADMIN CHECK TABLE act")
      t("DROP INDEX nidx ON act")
      t("DROP TABLE IF EXISTS cmp")
      t("CREATE TABLE cmp (o_orderkey BIGINT PRIMARY KEY, o_totalprice DOUBLE)")
      t("INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 400")
      t("INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 800")
      t("ADMIN COMPACT TABLE cmp")
      t("SELECT o_orderkey FROM cmp WHERE o_orderkey = 7")
    }
    spark.stop()
  }
}
