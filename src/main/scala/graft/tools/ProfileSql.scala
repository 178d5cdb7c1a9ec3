package graft.tools

import graft.{Engine, GraftSession, Tables}

/** Scratch profiler for the SQL front-end lifecycle queries (dev only):
  * per-statement wall time of the sql_admin_check / sql_compact bodies.
  */
object ProfileSql {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-60s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    Tables.names.filterNot(_ == "events").foreach(n =>
      Tables.load(spark, d, n).createOrReplaceTempView(n))
    Tables.loadEvents(spark, d).createOrReplaceTempView("events")
    val gs = time("new GraftSession")(new GraftSession(spark))

    def ex(sql: String): Unit =
      time(sql.replaceAll("\\s+", " ").take(58))(gs.execute(sql).collect())

    ex("CREATE DATABASE IF NOT EXISTS graft_prof")
    ex("USE graft_prof")

    println("== sql_admin_check body ==")
    ex("DROP TABLE IF EXISTS act")
    ex("CREATE TABLE act (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR(32))")
    ex("INSERT INTO act SELECT n_nationkey, n_name FROM nation")
    ex("CREATE INDEX nidx ON act (n_name)")
    ex("ADMIN CHECK TABLE act")

    println("== sql_compact body ==")
    ex("DROP TABLE IF EXISTS cmp")
    ex("CREATE TABLE cmp (o_orderkey BIGINT PRIMARY KEY, o_totalprice DOUBLE)")
    ex("INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 400")
    ex("INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 800")
    ex("INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey > 800 AND o_orderkey <= 1200")
    ex("ADMIN COMPACT TABLE cmp")
    ex("SELECT o_orderkey, round(o_totalprice, 2) AS price FROM graft_prof.cmp")

    println("== sql_txn body ==")
    ex("DROP TABLE IF EXISTS txn_t")
    ex("CREATE TABLE txn_t (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR(32))")
    ex("INSERT INTO txn_t SELECT n_nationkey, n_name FROM nation")
    time("txn block") {
      gs.executeAll(
        """BEGIN;
           DELETE FROM txn_t WHERE n_nationkey % 2 = 0;
           INSERT INTO txn_t VALUES (100, 'ATLANTIS');
           COMMIT""")
    }
    spark.stop()
  }
}
