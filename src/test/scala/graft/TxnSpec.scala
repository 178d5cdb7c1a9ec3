package graft

/** Explicit-transaction semantics: read-your-own-writes via the overlay
  * (the UnionScan analog, reference `executor/union_scan.go:90-130`),
  * COMMIT durability, ROLLBACK discard, BEGIN/DDL implicit commit.
  */
class TxnSpec extends SparkSuite {

  private lazy val gs: GraftSession = {
    val s = new GraftSession(spark)
    s.execute("CREATE DATABASE IF NOT EXISTS txndb")
    s.execute("USE txndb")
    s
  }

  test("INSERT inside a txn is visible to the session, gone after ROLLBACK") {
    gs.execute("DROP TABLE IF EXISTS t1")
    gs.execute("CREATE TABLE t1 (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO t1 VALUES (1, 'a')")
    gs.execute("BEGIN")
    gs.execute("INSERT INTO t1 VALUES (2, 'b')")
    // read-your-own-writes: the uncommitted row is visible...
    assert(gs.query("SELECT id FROM t1 ORDER BY id") == Seq("1", "2"))
    // ...but the base table is untouched (qualified reads bypass the overlay)
    assert(spark.table("txndb.t1").count() == 1)
    gs.execute("ROLLBACK")
    assert(gs.query("SELECT id FROM t1 ORDER BY id") == Seq("1"))
  }

  test("COMMIT makes buffered writes durable") {
    gs.execute("DROP TABLE IF EXISTS t2")
    gs.execute("CREATE TABLE t2 (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO t2 VALUES (1, 'a'), (2, 'b')")
    gs.executeAll(
      """BEGIN;
         INSERT INTO t2 VALUES (3, 'c');
         DELETE FROM t2 WHERE id = 1;
         REPLACE INTO t2 VALUES (2, 'B');
         COMMIT""")
    assert(gs.query("SELECT id, v FROM t2 ORDER BY id") == Seq("2 B", "3 c"))
    assert(spark.table("txndb.t2").count() == 2)
  }

  test("multi-table txn where one overlay reads the other's base") {
    gs.execute("DROP TABLE IF EXISTS src")
    gs.execute("DROP TABLE IF EXISTS dst")
    gs.execute("CREATE TABLE src (id BIGINT)")
    gs.execute("CREATE TABLE dst (id BIGINT)")
    gs.execute("INSERT INTO src VALUES (1), (2)")
    gs.executeAll(
      """BEGIN;
         INSERT INTO dst SELECT id + 10 FROM src;
         DELETE FROM src WHERE id = 1;
         COMMIT""")
    assert(gs.query("SELECT id FROM src") == Seq("2"))
    assert(gs.query("SELECT id FROM dst ORDER BY id") == Seq("11", "12"))
  }

  test("BEGIN and DDL implicitly commit the open transaction") {
    gs.execute("DROP TABLE IF EXISTS t3")
    gs.execute("CREATE TABLE t3 (id BIGINT)")
    gs.execute("BEGIN")
    gs.execute("INSERT INTO t3 VALUES (1)")
    gs.execute("BEGIN") // implicit commit of the first txn
    assert(spark.table("txndb.t3").count() == 1)
    gs.execute("INSERT INTO t3 VALUES (2)")
    gs.execute("CREATE TABLE t3b (id BIGINT)") // DDL implicit commit
    assert(spark.table("txndb.t3").count() == 2)
    gs.execute("ROLLBACK") // nothing open — no-op
    assert(gs.query("SELECT count(*) AS n FROM t3") == Seq("2"))
  }

  test("txn shadow preserves a displaced temp view across rollback") {
    // note: DROP TABLE must run before the view exists — Spark's DROP
    // TABLE resolves (and drops) a same-named temp view first
    gs.execute("DROP TABLE IF EXISTS shadowed")
    gs.execute("CREATE TABLE shadowed (id BIGINT)")
    gs.execute("INSERT INTO shadowed VALUES (42)")
    spark.range(3).toDF("id").createOrReplaceTempView("shadowed")
    gs.execute("BEGIN")
    // unqualified DML resolves the catalog table (the view keeps its name
    // for reads, but the write targets the table in the current db)
    gs.execute("DELETE FROM shadowed WHERE id = 42")
    gs.execute("ROLLBACK")
    // the original temp view is back, and the base table is untouched
    assert(spark.table("shadowed").count() == 3)
    assert(spark.table("txndb.shadowed").count() == 1)
    spark.catalog.dropTempView("shadowed")
  }

  test("unsupported INSERT form inside a txn raises instead of bypassing") {
    gs.execute("DROP TABLE IF EXISTS t5")
    gs.execute("CREATE TABLE t5 (id BIGINT)")
    gs.execute("BEGIN")
    intercept[IllegalArgumentException](
      gs.execute("INSERT INTO t5 TABLE t5"))
    gs.execute("ROLLBACK")
  }

  test("malformed CREATE does not implicitly commit") {
    gs.execute("DROP TABLE IF EXISTS t6")
    gs.execute("CREATE TABLE t6 (id BIGINT)")
    gs.execute("BEGIN")
    gs.execute("INSERT INTO t6 VALUES (1)")
    intercept[Exception](gs.execute("CREATE VIEWX nonsense"))
    // txn still open: the insert is visible to the session, not the base
    assert(gs.query("SELECT count(*) AS n FROM t6") == Seq("1"))
    assert(spark.table("txndb.t6").count() == 0)
    gs.execute("ROLLBACK")
  }

  test("COMMIT rewrites only the buckets its statements touched") {
    gs.execute("DROP TABLE IF EXISTS tp")
    gs.execute("CREATE TABLE tp (id BIGINT PRIMARY KEY, v VARCHAR(8))")
    spark.range(100).selectExpr("id", "concat('v', id) AS v")
      .createOrReplaceTempView("tp_src")
    gs.execute("INSERT INTO tp SELECT id, v FROM tp_src")
    gs.executeAll(
      """BEGIN;
         DELETE FROM tp WHERE id = 3;
         INSERT INTO tp VALUES (200, 'x');
         COMMIT""")
    val (rewritten, total) = gs.lastRewrite.getOrElse(fail("no rewrite"))
    assert(rewritten < total, s"($rewritten, $total)")
    assert(spark.table("txndb.tp").count() == 100)
    assert(spark.table("txndb.tp").where("id = 3").count() == 0)
    assert(spark.table("txndb.tp").where("id = 200").count() == 1)
  }

  test("txn writes maintain indexes only at COMMIT") {
    gs.execute("DROP TABLE IF EXISTS t4")
    gs.execute("CREATE TABLE t4 (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO t4 VALUES (1, 'a')")
    gs.execute("CREATE INDEX vx ON t4 (v)")
    gs.execute("BEGIN")
    gs.execute("INSERT INTO t4 VALUES (2, 'b')")
    gs.execute("COMMIT")
    assert(gs.query("ADMIN CHECK TABLE t4") == Seq("t4 vx OK"))
  }
}
