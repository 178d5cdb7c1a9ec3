package graft

/** MustQuery-style end-to-end tests through the MySQL-dialect front-end,
  * mirroring the reference's testkit suites
  * (`executor/executor_test.go`, `executor/write_test.go`,
  * `executor/ddl_test.go` — SQL in, string rows out).
  */
class SqlFrontendSpec extends SparkSuite {

  private lazy val gs: GraftSession = {
    Tables.names.filterNot(_ == "events").foreach(n =>
      Tables.load(spark, sf, n).createOrReplaceTempView(n))
    Tables.loadEvents(spark, sf).createOrReplaceTempView("events")
    new GraftSession(spark)
  }

  test("user variables: set / get / overwrite / NULL-unset") {
    gs.execute("SET @x = 42")
    assert(gs.query("SELECT @x + 1 AS v") == Seq("43"))
    gs.execute("SET @x := 'abc'")
    assert(gs.query("SELECT @x AS v") == Seq("abc"))
    gs.execute("SET @x = NULL")
    assert(gs.query("SELECT @x AS v") == Seq("<nil>"))
    assert(gs.query("SELECT @never_set AS v") == Seq("<nil>"))
    gs.execute("SET @a = 1, @b = @a + 10")
    assert(gs.query("SELECT @a + @b AS v") == Seq("12"))
  }

  test("string variables survive embedded quotes and backslashes") {
    gs.execute("SET @q = concat('a', char(39), 'b')") // a'b
    assert(gs.query("SELECT @q AS v, length(@q) AS n") == Seq("a'b 3"))
    gs.execute("SET @bs = concat('x', char(92), 'y')") // x\y
    assert(gs.query("SELECT length(@bs) AS n") == Seq("3"))
  }

  test("UNIQUE INDEX and qualified index DDL keep metadata consistent") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS qi")
    gs.execute("CREATE TABLE qi (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO qi VALUES (1, 'a')")
    gs.execute("USE default")
    // created from another current database, via qualified name
    gs.execute("CREATE UNIQUE INDEX uq ON sqlfe.qi (v)")
    assert(gs.query("ADMIN CHECK TABLE sqlfe.qi") == Seq("qi uq OK"))
    gs.execute("INSERT INTO sqlfe.qi VALUES (2, 'b')") // refresh via ref
    assert(gs.query("ADMIN CHECK TABLE sqlfe.qi") == Seq("qi uq OK"))
    val create = gs.query("SHOW CREATE TABLE sqlfe.qi").head
    assert(create.contains("UNIQUE KEY `uq` (`v`)"), create)
    gs.execute("DROP INDEX uq ON sqlfe.qi")
    intercept[Exception](gs.execute("DROP INDEX uq ON sqlfe.qi"))
  }

  test("columns named like constraint keywords parse as columns") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS kw")
    gs.execute("CREATE TABLE kw (unique_id BIGINT, index_no INT)")
    gs.execute("INSERT INTO kw VALUES (1, 2)")
    assert(gs.query("SELECT unique_id, index_no FROM kw") == Seq("1 2"))
  }

  test("FROM DUAL inside a string literal is preserved") {
    assert(gs.query("SELECT 'report from dual source' AS s FROM DUAL") ==
      Seq("report from dual source"))
  }

  test("SELECT @x := expr assigns and returns the value") {
    assert(gs.query("SELECT @counter := 6 * 7") == Seq("42"))
    assert(gs.query("SELECT @counter + 1 AS v") == Seq("43"))
    // alias and FROM DUAL forms
    val df = gs.execute("SELECT @counter := 10 AS answer FROM DUAL")
    assert(df.schema.fieldNames.toSeq == Seq("answer"))
    assert(df.collect()(0).getInt(0) == 10)
    assert(gs.query("SELECT @counter AS v") == Seq("10"))
  }

  test("escaped quote in a variable does not break later rewrites") {
    gs.execute("SET @qq = concat('it', char(39), 's LIMIT 1, 2')")
    assert(gs.query("SELECT @qq AS v") == Seq("it's LIMIT 1, 2"))
  }

  test("MySQL comma LIMIT: LIMIT offset, count") {
    val rows = gs.query(
      "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 2, 3")
    assert(rows == Seq("2", "3", "4"))
    assert(gs.query("SELECT 'LIMIT 1, 2' AS s") == Seq("LIMIT 1, 2"))
  }

  test("DESCRIBE renders MySQL Field/Type/Null/Key columns") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS dsc")
    gs.execute(
      "CREATE TABLE dsc (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(10), KEY vk (v))")
    val d = gs.query("DESC dsc")
    assert(d == Seq("id bigint NO PRI", "v varchar(255) YES MUL"))
    gs.execute("DROP TABLE IF EXISTS dscu")
    gs.execute(
      "CREATE TABLE dscu (id BIGINT PRIMARY KEY, u VARCHAR(10), UNIQUE KEY uu (u))")
    assert(gs.query("DESC dscu") ==
      Seq("id bigint NO PRI", "u varchar(255) YES UNI"))
    gs.execute("ALTER TABLE dsc DROP INDEX vk")
    assert(gs.query("DESC dsc") == Seq("id bigint NO PRI", "v varchar(255) YES "))
    // composite unique index: MySQL shows MUL on its first column, never UNI
    gs.execute("DROP TABLE IF EXISTS dscc")
    gs.execute(
      "CREATE TABLE dscc (a BIGINT, b BIGINT, UNIQUE KEY ab (a, b))")
    assert(gs.query("DESC dscc") ==
      Seq("a bigint YES MUL", "b bigint YES "))
  }

  test("system variables: SET / SELECT @@ / SHOW VARIABLES LIKE") {
    gs.execute("SET max_allowed_packet = 1024")
    assert(gs.query("SELECT @@max_allowed_packet AS v") == Seq("1024"))
    assert(gs.query("SHOW VARIABLES LIKE 'max_allowed%'") ==
      Seq("max_allowed_packet 1024"))
    assert(gs.query("SELECT @@time_zone AS v") == Seq("UTC"))
  }

  test("SELECT ... FROM DUAL and strcmp through SQL") {
    assert(gs.query("SELECT 1 + 1 AS v FROM DUAL") == Seq("2"))
    assert(gs.query("SELECT strcmp('a', 'b') AS v, strcmp('b', 'a') AS w") ==
      Seq("-1 1"))
  }

  test("DDL lifecycle with MySQL column types") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS t")
    gs.execute("""CREATE TABLE t (
        id BIGINT NOT NULL PRIMARY KEY,
        v VARCHAR(64),
        score DOUBLE,
        KEY vidx (v)
      ) ENGINE=InnoDB DEFAULT CHARSET=utf8""")
    gs.execute("INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    assert(gs.query("SELECT id, v FROM t ORDER BY id") == Seq("1 a", "2 b"))
    val create = gs.query("SHOW CREATE TABLE t").head
    assert(create.contains("varchar(255)") && create.contains("bigint"))
    assert(create.contains("PRIMARY KEY (`id`)"))
    assert(create.contains("KEY `vidx` (`v`)"))
    gs.execute("ALTER TABLE t ADD COLUMN extra INT")
    assert(gs.query("SELECT count(*) AS n FROM t WHERE extra IS NULL") == Seq("2"))
    assert(gs.query("SHOW TABLES").contains("t"))
  }

  test("REPLACE INTO: delete-on-duplicate-key upsert") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS r")
    gs.execute("CREATE TABLE r (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO r VALUES (1, 'a'), (2, 'b')")
    gs.execute("REPLACE INTO r VALUES (1, 'x'), (3, 'c')")
    assert(gs.query("SELECT id, v FROM r ORDER BY id") ==
      Seq("1 x", "2 b", "3 c"))
  }

  test("DELETE FROM with tri-valued WHERE keeps NULL-condition rows") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS d")
    gs.execute("CREATE TABLE d (id BIGINT, v INT)")
    gs.execute("INSERT INTO d VALUES (1, 10), (2, NULL), (3, 30)")
    gs.execute("DELETE FROM d WHERE v > 15")
    assert(gs.query("SELECT id FROM d ORDER BY id") == Seq("1", "2"))
  }

  test("temp-view drop and no-op CREATE leave table metadata intact") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS mt")
    gs.execute(
      "CREATE TABLE mt (id BIGINT PRIMARY KEY, v VARCHAR(10) DEFAULT 'dflt')")
    gs.execute("CREATE INDEX mv ON mt (v)")
    gs.execute("INSERT INTO mt VALUES (1, 'a')")
    // a same-named temp view: DROP TABLE takes the view (Spark
    // resolution) and must NOT wipe the real table's session metadata
    spark.range(1).toDF("x").createOrReplaceTempView("mt")
    gs.execute("DROP TABLE mt") // drops only the view
    // index maintenance still runs on writes; defaults still fill
    gs.execute("INSERT INTO mt (id) VALUES (2)")
    assert(gs.query("SELECT v FROM mt WHERE id = 2") == Seq("dflt"))
    assert(gs.query("ADMIN CHECK TABLE mt") == Seq("mt mv OK"))
    // IF NOT EXISTS no-op with a DIFFERENT schema must not re-key or
    // re-default the existing table
    gs.execute(
      "CREATE TABLE IF NOT EXISTS mt (v VARCHAR(10) PRIMARY KEY DEFAULT 'x')")
    gs.execute("INSERT INTO mt (id) VALUES (3)")
    assert(gs.query("SELECT v FROM mt WHERE id = 3") == Seq("dflt"))
    gs.execute("REPLACE INTO mt VALUES (1, 'b')") // PK displacement, not append
    assert(gs.query("SELECT count(*) AS n FROM mt") == Seq("3"))
    gs.execute("DROP TABLE mt")
    gs.execute("USE default")
  }

  test("ADMIN SHOW DDL / ADMIN SHOW DDL JOBS render the session DDL history") {
    // fresh session: the job log is per-session state, like the
    // reference's history being read at the statement's snapshot
    val g2 = new GraftSession(spark)
    // IF EXISTS no-op on an absent db: no job, no schema-version bump
    // (the reference's history only holds jobs that ran)
    g2.execute("DROP DATABASE IF EXISTS sddl")
    g2.execute("CREATE DATABASE sddl")
    g2.execute("CREATE DATABASE IF NOT EXISTS sddl") // no-op → no job
    g2.execute("USE sddl")
    g2.execute("CREATE TABLE sd (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    g2.execute("CREATE TABLE IF NOT EXISTS sd (id BIGINT)") // no-op
    g2.execute("CREATE INDEX sv ON sd (v)")
    g2.execute("ALTER TABLE sd ADD COLUMN w INT")
    g2.execute("ALTER TABLE sd DROP COLUMN IF EXISTS nope") // no-op
    g2.execute("USE default")

    // ADMIN SHOW DDL: the 6-column owner/version snapshot
    // (planbuilder.go:505-515); synchronous DDL → nothing running
    val show = g2.execute("ADMIN SHOW DDL")
    assert(show.columns.toSeq == Seq("SCHEMA_VER", "OWNER_ID",
      "OWNER_ADDRESS", "RUNNING_JOBS", "SELF_ID", "QUERY"))
    val r = show.head()
    assert(r.getLong(0) == 4L, s"schema_ver ${r.getLong(0)}")
    assert(r.getString(3) == "" && r.getString(5) == "")

    // ADMIN SHOW DDL JOBS: 11 columns (planbuilder.go:517-531),
    // newest first, terminal states only
    val jobs = g2.execute("ADMIN SHOW DDL JOBS")
    assert(jobs.columns.toSeq == Seq("JOB_ID", "DB_NAME", "TABLE_NAME",
      "JOB_TYPE", "SCHEMA_STATE", "SCHEMA_ID", "TABLE_ID", "ROW_COUNT",
      "START_TIME", "END_TIME", "STATE"))
    val got = jobs.collect().map(x => (x.getLong(0), x.getString(3)))
    assert(got.toSeq == Seq(4L -> "add column", 3L -> "add index",
      2L -> "create table", 1L -> "create schema"),
      got.mkString(","))
    assert(jobs.collect().forall(_.getString(10) == "synced"))

    // JOBS n bounds the fetched window; WHERE filters on top of it
    assert(g2.execute("ADMIN SHOW DDL JOBS 2").count() == 2)
    assert(g2.execute(
      "ADMIN SHOW DDL JOBS WHERE JOB_TYPE = 'add index'").count() == 1)
    g2.execute("DROP DATABASE sddl")
    assert(g2.execute("ADMIN SHOW DDL").head().getLong(0) == 5L)
  }

  test("ADMIN CHECK TABLE passes when consistent, flags drift") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS ac")
    gs.execute("CREATE TABLE ac (id BIGINT PRIMARY KEY, v VARCHAR(10))")
    gs.execute("INSERT INTO ac VALUES (1, 'a'), (2, 'b')")
    gs.execute("CREATE INDEX vidx ON ac (v)")
    assert(gs.query("ADMIN CHECK TABLE ac") == Seq("ac vidx OK"))
    // out-of-band write straight into the physical bucket table
    // (bypasses the engine's index maintenance)
    spark.sql("INSERT INTO sqlfe.ac__data VALUES (9, 'z', 0)")
    assert(gs.query("ADMIN CHECK TABLE ac") == Seq("ac vidx CORRUPT"))
    gs.execute("DROP INDEX vidx ON ac")
    assert(gs.query("ADMIN CHECK TABLE ac") == Seq("ac <none> OK"))
  }

  test("EXPLAIN returns the formatted physical plan as rows") {
    val lines = gs.query("EXPLAIN SELECT count(*) FROM lineitem")
    assert(lines.exists(_.contains("Physical Plan")))
    assert(lines.exists(_.contains("Scan parquet")))
  }

  test("SHOW DATABASES lists created databases") {
    assert(gs.query("SHOW DATABASES").contains("sqlfe"))
  }

  test("SELECT roundtrip over driver tables matches DataFrame result") {
    gs.execute("SET @minqty = 45")
    val viaSql = gs.query(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_quantity > @minqty GROUP BY l_returnflag
         ORDER BY l_returnflag""")
    val viaDf = Tables.load(spark, sf, "lineitem")
      .where(org.apache.spark.sql.functions.col("l_quantity") > 45)
      .groupBy("l_returnflag").count()
      .orderBy("l_returnflag").collect()
      .map(r => s"${r.getString(0)} ${r.getLong(1)}").toSeq
    assert(viaSql == viaDf)
  }

  test("multi-statement script executes in order, one result per statement") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    val results = gs.executeAll(
      """USE sqlfe;
         DROP TABLE IF EXISTS ms;
         CREATE TABLE ms (id BIGINT, note VARCHAR(20));
         INSERT INTO ms VALUES (1, 'semi;colon'), (2, 'b');
         SELECT id, note FROM ms ORDER BY id""")
    assert(results.length == 5)
    assert(results.last.collect().map(_.getString(1)).toSeq ==
      Seq("semi;colon", "b"))
  }

  test("EXPLAIN of a write statement plans the sink without executing it") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS expl")
    gs.execute("CREATE TABLE expl (id BIGINT)")
    gs.execute("INSERT INTO expl VALUES (1)")
    val ins = gs.query("EXPLAIN INSERT INTO expl VALUES (2)")
    assert(ins.exists(_.contains("Physical Plan")), ins)
    val del = gs.query("EXPLAIN DELETE FROM expl WHERE id = 1")
    assert(del.exists(_.contains("Physical Plan")), del)
    val rep = gs.query("EXPLAIN REPLACE INTO expl VALUES (1)")
    assert(rep.exists(_.contains("Physical Plan")), rep)
    // none of the explained writes executed their side effect
    assert(gs.query("SELECT count(*) AS n FROM expl") == Seq("1"))
    assert(gs.query("SHOW CREATE DATABASE sqlfe") ==
      Seq("sqlfe CREATE DATABASE `sqlfe`"))
    intercept[IllegalArgumentException](
      gs.execute("EXPLAIN GRANT ALL ON x TO y"))
  }

  test("@@GLOBAL vs @@SESSION sysvar scoping is distinct") {
    gs.execute("SET max_allowed_packet = 2048")
    gs.execute("SET GLOBAL max_allowed_packet = 128")
    // the GLOBAL write does not leak into session scope, and vice versa
    assert(gs.query("SELECT @@max_allowed_packet AS v") == Seq("2048"))
    assert(gs.query("SELECT @@session.max_allowed_packet AS v") == Seq("2048"))
    assert(gs.query("SELECT @@global.max_allowed_packet AS v") == Seq("128"))
    assert(gs.query("SHOW VARIABLES LIKE 'max_allowed%'") ==
      Seq("max_allowed_packet 2048"))
    assert(gs.query("SHOW GLOBAL VARIABLES LIKE 'max_allowed%'") ==
      Seq("max_allowed_packet 128"))
    gs.execute("SET @@global.version_comment = 'patched'")
    assert(gs.query("SELECT @@global.version_comment AS v") == Seq("patched"))
    assert(gs.query("SELECT @@version_comment AS v") ==
      Seq("graft analytics engine"))
  }

  test("SHOW WARNINGS surfaces statement notes, cleared by the next one") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS definitely_missing_tbl")
    val w = gs.query("SHOW WARNINGS")
    assert(w.exists(l => l.contains("1051") && l.contains("Note")), w)
    assert(gs.query("SHOW COUNT(*) WARNINGS") == Seq("1"))
    gs.execute("SELECT 1") // any next statement clears the area
    assert(gs.query("SHOW WARNINGS").isEmpty)
  }

  test("error parity: unknown objects and unsupported statements raise") {
    intercept[Exception](gs.execute("SELECT * FROM no_such_table_xyz"))
    intercept[Exception](gs.execute("USE sqlfe; SELECT 1")) // not a USE form
    intercept[IllegalArgumentException](gs.execute("GRANT ALL ON *.* TO x"))
    intercept[IllegalArgumentException](gs.execute("SET @@ = 3"))
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS dup")
    gs.execute("CREATE TABLE dup (id BIGINT)")
    intercept[Exception](gs.execute("CREATE TABLE dup (id BIGINT)"))
  }

  test("REPLACE from a fresh session upserts on the durable PK key") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS xs")
    // PK deliberately NOT the first column: a fresh session must read the
    // key from the table's graft.keys property, not fall back to col 1
    gs.execute("CREATE TABLE xs (v VARCHAR(8), id BIGINT PRIMARY KEY)")
    gs.execute("INSERT INTO xs VALUES ('a', 1), ('b', 2)")
    val gs2 = new GraftSession(spark) // no session-local metadata
    gs2.execute("REPLACE INTO sqlfe.xs VALUES ('A', 1), ('c', 3)")
    assert(gs2.query("SELECT v, id FROM sqlfe.xs ORDER BY id") ==
      Seq("A 1", "b 2", "c 3"))
  }

  test("NULL primary-key inserts are rejected (MySQL 1048)") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS np")
    gs.execute("CREATE TABLE np (id BIGINT PRIMARY KEY, v INT)")
    intercept[Exception](gs.execute("INSERT INTO np VALUES (NULL, 1)"))
    assert(gs.query("SELECT count(*) FROM np") == Seq("0"))
  }

  test("cross-type DELETE literals fall back to the scan; same-type stay static") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS xt")
    gs.execute("CREATE TABLE xt (id BIGINT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO xt VALUES (10, 1), (11, 2)")
    // fractional literal: CAST-to-key would lie about the match set —
    // must take the discovery scan, and correctly match nothing
    gs.execute("DELETE FROM xt WHERE id = 10.5")
    assert(!gs.lastStaticPrune)
    assert(gs.query("SELECT count(*) FROM xt") == Seq("2"))
    gs.execute("DELETE FROM xt WHERE id = 10")
    assert(gs.lastStaticPrune)
    assert(gs.query("SELECT id FROM xt") == Seq("11"))
  }

  test("backtick-quoted, db-qualified CREATE TABLE names parse") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("DROP TABLE IF EXISTS sqlfe.bq")
    gs.execute("CREATE TABLE `sqlfe`.`bq` (id BIGINT PRIMARY KEY, v VARCHAR(8))")
    gs.execute("INSERT INTO sqlfe.bq VALUES (1, 'a')")
    assert(gs.query("SELECT id, v FROM sqlfe.bq") == Seq("1 a"))
    gs.execute("DROP TABLE sqlfe.bq")
  }

  test("ANALYZE TABLE populates catalog stats used by CBO") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS st")
    gs.execute("CREATE TABLE st (id BIGINT, v VARCHAR(10))")
    gs.execute("INSERT INTO st VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    gs.execute("ANALYZE TABLE st")
    // stats land on the physical bucket table (what the optimizer scans)
    assert(Stats.rowCount(spark, "sqlfe.st__data").contains(BigInt(3)))
  }

  test("ALTER TABLE DROP/MODIFY/CHANGE COLUMN lifecycle (ddl_api.go:1110,1488,1524)") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS alt")
    gs.execute(
      """CREATE TABLE alt (id BIGINT PRIMARY KEY, v VARCHAR(32),
           junk INT, region_id INT)""")
    gs.execute("INSERT INTO alt VALUES (1, 'a', 0, 10), (2, 'b', 0, 20)")
    gs.execute("ALTER TABLE alt MODIFY COLUMN region_id BIGINT")
    assert(gs.query("DESC alt").exists(_.startsWith("region_id bigint")))
    // narrowing into a small DECIMAL would overflow values away - rejected
    intercept[Exception](
      gs.execute("ALTER TABLE alt MODIFY COLUMN region_id DECIMAL(5,0)"))
    gs.execute("ALTER TABLE alt CHANGE COLUMN v label VARCHAR(64)")
    assert(gs.query("SELECT label FROM alt WHERE id = 1") == Seq("a"))
    gs.execute("ALTER TABLE alt DROP COLUMN junk")
    assert(gs.query("DESC alt").map(_.split(" ").head) ==
      Seq("id", "label", "region_id"))
    // data survives every recreate, and post-DDL DML works
    assert(gs.query("SELECT id, label, region_id FROM alt ORDER BY id") ==
      Seq("1 a 10", "2 b 20"))
    gs.execute("INSERT INTO alt VALUES (3, 'c', 30)")
    gs.execute("DELETE FROM alt WHERE id = 1")
    assert(gs.query("SELECT id, label, region_id FROM alt ORDER BY id") ==
      Seq("2 b 20", "3 c 30"))
    // dropping an indexed column drops the column from the index
    gs.execute("CREATE INDEX lr ON alt (label, region_id)")
    gs.execute("ALTER TABLE alt DROP COLUMN region_id")
    assert(gs.query("ADMIN CHECK TABLE alt") == Seq("alt lr OK"))
    val create = gs.query("SHOW CREATE TABLE alt").head
    assert(create.contains("KEY `lr` (`label`)"), create)
  }

  test("BIGINT UNSIGNED widens to DECIMAL(20,0): full 0..2^64-1 roundtrip") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS uns")
    gs.execute(
      """CREATE TABLE uns (id INT UNSIGNED PRIMARY KEY,
           big BIGINT UNSIGNED, sm SMALLINT UNSIGNED)""")
    // boundary values above 2^63-1 survive exactly (SURVEY §1.4 mapping;
    // reference unsigned paths builtin_arithmetic.go:402-409)
    gs.execute("INSERT INTO uns VALUES (4294967295, 18446744073709551615, 65535)")
    gs.execute("INSERT INTO uns VALUES (1, 9223372036854775808, 0)")
    assert(gs.query("SELECT big FROM uns ORDER BY big") ==
      Seq("9223372036854775808", "18446744073709551615"))
    assert(gs.query("SELECT id, sm FROM uns WHERE big = 18446744073709551615") ==
      Seq("4294967295 65535"))
    val d = gs.query("DESC uns")
    assert(d.exists(_.startsWith("id bigint")), d)          // INT UNSIGNED
    assert(d.exists(_.startsWith("big decimal(20,0)")), d)  // BIGINT UNSIGNED
    assert(d.exists(_.startsWith("sm int")), d)             // SMALLINT UNSIGNED
    // arithmetic above the signed-long range stays exact
    assert(gs.query("SELECT big + 1 FROM uns WHERE id = 1") ==
      Seq("9223372036854775809"))
  }

  test("non-strict sql_mode coerces truncated strings with warning 1265") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS co")
    gs.execute("CREATE TABLE co (id BIGINT PRIMARY KEY, score DOUBLE)")
    gs.execute("SET sql_mode = ''")
    try {
      gs.execute("INSERT INTO co VALUES (1, '12.5abc'), (2, 'junk')")
      val w = gs.query("SHOW WARNINGS")
      assert(w.count(_.contains("1265")) == 2, w)
      assert(gs.query("SELECT id, score FROM co ORDER BY id") ==
        Seq("1 12.5", "2 0.0"))
    } finally gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
    // strict mode (the default) errors instead, like MySQL
    intercept[Exception](
      gs.execute("INSERT INTO co VALUES (3, 'junk2')"))
  }

  test("strict mode rounds a fractional STRING into an integral column") {
    // The r17-documented residual, closed in r18: MySQL STRICT parses a
    // COMPLETE fractional numeric literal and rounds half away from
    // zero into an integral column (types/convert.go StrToInt), where a
    // bare ANSI string→int cast rejects it. Malformed strings and
    // out-of-range values must still abort (the raise-vs-raise posture).
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS sfs")
    gs.execute("CREATE TABLE sfs (id BIGINT PRIMARY KEY, n INT, t TINYINT)")
    gs.execute("INSERT INTO sfs VALUES (1, '12.5', '1'), (2, '-12.5', '2.4')," +
      " (3, '12.4', '-2.5'), (4, '1.25e1', '0.5'), (5, '13.', '99.49')")
    assert(gs.query("SELECT id, n, t FROM sfs ORDER BY id") ==
      Seq("1 13 1", "2 -13 2", "3 12 -3", "4 13 1", "5 13 99"))
    // integer-form strings keep the exact 64-bit path, no double detour
    gs.execute("DROP TABLE IF EXISTS sfb")
    gs.execute("CREATE TABLE sfb (id BIGINT PRIMARY KEY, b BIGINT)")
    gs.execute("INSERT INTO sfb VALUES (1, '9223372036854775806')," +
      " (2, '9223372036854775806.6')")
    intercept[Exception]( // rounded '…807.6' overflows BIGINT → abort
      gs.execute("INSERT INTO sfb VALUES (3, '9223372036854775807.6')"))
    assert(gs.query("SELECT id, b FROM sfb ORDER BY id") ==
      Seq("1 9223372036854775806", "2 9223372036854775807"))
    // malformed still aborts; a fractional string past the DECLARED
    // range still raises 1264 (round happens BEFORE the range check)
    intercept[Exception](gs.execute("INSERT INTO sfs VALUES (9, '1x.5', '0')"))
    intercept[Exception](gs.execute("INSERT INTO sfs VALUES (9, '0', '127.5')"))
    intercept[Exception](gs.execute("INSERT INTO sfs VALUES (9, '1e300', '0')"))
    assert(gs.query("SELECT count(*) AS c FROM sfs") == Seq("5"))
  }

  test("ADMIN COMPACT TABLE folds multi-file buckets, content unchanged") {
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS cp")
    gs.execute("CREATE TABLE cp (id BIGINT PRIMARY KEY, v VARCHAR(16))")
    gs.execute("CREATE INDEX cpv ON cp (v)")
    // three separate statements → up to three files per touched bucket
    gs.execute("INSERT INTO cp VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    gs.execute("INSERT INTO cp VALUES (11, 'e'), (12, 'f'), (13, 'g')")
    gs.execute("INSERT INTO cp VALUES (21, 'h'), (22, 'i')")
    val beforeRows = gs.query("SELECT id, v FROM cp ORDER BY id")
    val Seq(r) = gs.query("ADMIN COMPACT TABLE cp")
    val Array(name, buckets, before, after) = r.split(" ")
    assert(name == "cp")
    assert(buckets.toInt > 0, s"expected multi-file buckets to compact: $r")
    assert(after.toInt < before.toInt, s"file count must shrink: $r")
    // one file per bucket partition afterwards
    assert(after.toInt <= spark.sql("SHOW PARTITIONS sqlfe.cp__data").count())
    // rows and index consistency untouched
    assert(gs.query("SELECT id, v FROM cp ORDER BY id") == beforeRows)
    assert(gs.query("ADMIN CHECK TABLE cp") == Seq("cp cpv OK"))
    // a second compaction is a no-op
    val Seq(r2) = gs.query("ADMIN COMPACT TABLE cp")
    assert(r2.split(" ")(1).toInt == 0, s"second compact must no-op: $r2")
    // non-managed targets are refused
    intercept[Exception](gs.execute("ADMIN COMPACT TABLE nation"))
  }

  test("ADMIN COMPACT clears a zero-row multi-file bucket (no-op holds)") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS cpz")
    gs.execute("CREATE TABLE cpz (id BIGINT PRIMARY KEY, v VARCHAR(16))")
    gs.execute("INSERT INTO cpz VALUES (1, 'a')")
    // fabricate a bucket dir holding two ZERO-row files: dynamic overwrite
    // stages nothing for it, so compaction must clear it directly
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          "cpz__data", Some("sqlfe"))).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val used = spark.sql("SHOW PARTITIONS sqlfe.cpz__data").collect()
      .map(_.getString(0).stripPrefix("__gb=").toInt).toSet
    val ghost = (0 until 1024).find(!used.contains(_)).get
    val tmp = java.nio.file.Files.createTempDirectory("graft-zb").toString
    spark.table("sqlfe.cpz__data").drop("__gb").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val ghostDir = new org.apache.hadoop.fs.Path(loc, s"__gb=$ghost")
    fs.mkdirs(ghostDir)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(ghostDir, "part-zero-a.parquet"),
      false, spark.sessionState.newHadoopConf())
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(ghostDir, "part-zero-b.parquet"),
      false, spark.sessionState.newHadoopConf())
    GraftSession.deleteRecursively(java.nio.file.Paths.get(tmp))
    val Seq(r) = gs.query("ADMIN COMPACT TABLE cpz")
    assert(r.split(" ")(1).toInt >= 1, s"ghost bucket not counted: $r")
    assert(!fs.exists(ghostDir), "zero-row bucket dir must be cleared")
    assert(gs.query("SELECT id, v FROM cpz") == Seq("1 a"))
    val Seq(r2) = gs.query("ADMIN COMPACT TABLE cpz")
    assert(r2.split(" ")(1).toInt == 0, s"second compact must no-op: $r2")
  }

  test("metadata is per-database: same-named tables do not clobber") {
    gs.execute("CREATE DATABASE IF NOT EXISTS metaa")
    gs.execute("CREATE DATABASE IF NOT EXISTS metab")
    gs.execute("USE metaa")
    gs.execute("CREATE TABLE mt (id INT PRIMARY KEY, v INT DEFAULT 5)")
    gs.execute("USE metab")
    // dropping a NONEXISTENT metab.mt must not wipe metaa.mt's metadata
    gs.execute("DROP TABLE IF EXISTS mt")
    // and a same-named metab.mt keeps its own (default-less) metadata
    gs.execute("CREATE TABLE mt (id INT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO mt (id) VALUES (1)")
    gs.execute("USE metaa")
    gs.execute("INSERT INTO mt (id) VALUES (1)")
    assert(gs.query("SELECT id, v FROM metaa.mt") == Seq("1 5"),
      "metaa.mt must keep DEFAULT 5")
    assert(gs.query("SELECT id, coalesce(v, -1) FROM metab.mt") == Seq("1 -1"),
      "metab.mt has no default")
    gs.execute("USE default")
    gs.execute("DROP DATABASE metaa")
    gs.execute("DROP DATABASE metab")
  }

  test("DROP DATABASE sweeps table metadata; re-created table starts clean") {
    gs.execute("CREATE DATABASE IF NOT EXISTS metac")
    gs.execute("USE metac")
    gs.execute("CREATE TABLE ct (a INT DEFAULT 7, b INT)")
    gs.execute("USE default")
    gs.execute("DROP DATABASE metac")
    gs.execute("CREATE DATABASE metac")
    gs.execute("USE metac")
    gs.execute("CREATE TABLE ct (a INT, b INT)")
    gs.execute("INSERT INTO ct (b) VALUES (1)")
    assert(gs.query("SELECT coalesce(a, -1), b FROM ct") == Seq("-1 1"),
      "stale DEFAULT 7 must not leak into the re-created table")
    gs.execute("USE default")
    gs.execute("DROP DATABASE metac")
  }

  test("REPLACE INTO a table without PRIMARY KEY inserts (MySQL semantics)") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS nopk")
    gs.execute("CREATE TABLE nopk (a INT, b INT)")
    gs.execute("INSERT INTO nopk VALUES (1, 1)")
    gs.execute("REPLACE INTO nopk VALUES (1, 2)")
    // no unique key -> REPLACE behaves as INSERT: both rows survive
    assert(gs.query("SELECT a, b FROM nopk ORDER BY b") ==
      Seq("1 1", "1 2"))
    gs.execute("DROP TABLE nopk")
    gs.execute("USE default")
  }

  test("failed ALTER ADD COLUMN leaves no phantom default behind") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS altf")
    gs.execute("CREATE TABLE altf (id INT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO altf VALUES (1, NULL)")
    // duplicate column: the physical ALTER throws AFTER parsing recorded
    // the DEFAULT — which must be rolled back with it
    intercept[Exception](
      gs.execute("ALTER TABLE altf ADD COLUMN v DOUBLE DEFAULT 7"))
    gs.execute("INSERT INTO altf (id) VALUES (2)")
    assert(gs.query("SELECT id, coalesce(v, -1) FROM altf ORDER BY id") ==
      Seq("1 -1", "2 -1"), "phantom DEFAULT 7 from the failed ALTER")
    gs.execute("DROP TABLE altf")
    gs.execute("USE default")
  }

  test("failed CREATE INDEX leaves no phantom index entry") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS phidx")
    intercept[Exception](gs.execute("CREATE INDEX pi1 ON phidx (x)"))
    // the table is created AFTERWARDS: writes must not trip over a
    // phantom index on a column that never existed
    gs.execute("CREATE TABLE phidx (y INT PRIMARY KEY)")
    gs.execute("INSERT INTO phidx VALUES (1)")
    assert(gs.query("SELECT y FROM phidx") == Seq("1"))
    // duplicate index name is MySQL error 1061, not a silent overwrite
    gs.execute("CREATE INDEX pi2 ON phidx (y)")
    intercept[Exception](gs.execute("CREATE INDEX pi2 ON phidx (y)"))
    gs.execute("DROP TABLE phidx")
    gs.execute("USE default")
  }

  test("SET validates sysvar names and GLOBAL-only scope") {
    // unknown variable: write errors exactly as the read path does
    intercept[IllegalArgumentException](gs.execute("SET @@sql_modee = ''"))
    intercept[IllegalArgumentException](
      gs.execute("SET GLOBAL nonsense_var = 1"))
    // GLOBAL-only variable refuses a session-scope write (MySQL 1229)
    intercept[IllegalArgumentException](
      gs.execute("SET SESSION max_connections = 5"))
    gs.execute("SET GLOBAL max_connections = 200")
    assert(gs.query("SELECT @@max_connections AS v") == Seq("200"))
  }

  test("0-row DML sources are no-ops, never errors (MySQL '0 rows affected')") {
    // Every SELECT-sourced write path pins its source by staging it to
    // parquet and reading it back. A 0-row source stages ZERO data
    // files, and schema INFERENCE on the empty stage used to throw
    // UNABLE_TO_INFER_SCHEMA — turning legal no-op statements into
    // crashes (found by the lifecycle profiler's 0-row control; the
    // driver gate never exercises an empty source). MySQL semantics:
    // "0 rows affected", state unchanged. Each statement below routes
    // a different staged read-back.
    gs.execute("CREATE DATABASE IF NOT EXISTS zerodb")
    gs.execute("USE zerodb")
    gs.execute("DROP TABLE IF EXISTS z")
    gs.execute("CREATE TABLE z (k BIGINT PRIMARY KEY, v DOUBLE)")
    gs.execute("INSERT INTO z VALUES (1, 1.5), (2, 2.5)")
    // keyed managed INSERT...SELECT (statement-time staging pin)
    gs.execute(
      "INSERT INTO z SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 0")
    // REPLACE...SELECT matching nothing (displacement probe over ∅)
    gs.execute(
      "REPLACE INTO z SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 0")
    // keyed DELETE touching nothing
    gs.execute("DELETE FROM z WHERE k < 0")
    assert(gs.query("SELECT k, round(v, 1) FROM zerodb.z") ==
      Seq("1 1.5", "2 2.5"), "0-row statements must leave state untouched")
    // AUTO_INCREMENT id allocator over a 0-row scan source
    gs.execute("DROP TABLE IF EXISTS zai")
    gs.execute("CREATE TABLE zai (id INT PRIMARY KEY AUTO_INCREMENT, c BIGINT)")
    gs.execute(
      "INSERT INTO zai (c) SELECT c_custkey FROM customer WHERE c_custkey < 0")
    assert(gs.query("SELECT count(*) FROM zerodb.zai") == Seq("0"))
    // transactional pins: 0-row INSERT and REPLACE buffered then committed
    gs.executeAll(
      """BEGIN;
         INSERT INTO z SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 0;
         REPLACE INTO z SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 0;
         COMMIT""")
    assert(gs.query("SELECT count(*) FROM zerodb.z") == Seq("2"))
    // UNMANAGED table (created outside the front-end, stage-then-
    // overwrite rewrite): an unconditional DELETE empties it...
    spark.sql("DROP TABLE IF EXISTS zerodb.um")
    spark.sql("CREATE TABLE zerodb.um (k BIGINT, v STRING) USING parquet")
    spark.sql("INSERT INTO zerodb.um VALUES (1, 'a'), (2, 'b')")
    gs.execute("DELETE FROM um")
    assert(gs.query("SELECT count(*) FROM zerodb.um") == Seq("0"))
    // ...and a transaction emptying it commits as a truncate (the 2-phase
    // commit's unmanaged branch stages zero files)
    spark.sql("INSERT INTO zerodb.um VALUES (3, 'c')")
    gs.executeAll("BEGIN; DELETE FROM um; COMMIT")
    assert(gs.query("SELECT count(*) FROM zerodb.um") == Seq("0"))
    gs.execute("USE default")
    gs.execute("DROP DATABASE zerodb")
  }

  test("REPLACE intra-batch semantics: a later batch row displaces earlier ones") {
    // MySQL REPLACE is row-at-a-time: each arriving row deletes every
    // live row sharing its PK or any unique-key value, then inserts.
    // Within one statement that means a batch row survives iff no LATER
    // row shares any of its key values — including chains where the
    // displaced row had itself displaced a table row. Expected results
    // below are hand-derived from that row loop (reference:
    // executor/replace.go removeRow/addRecord per row).
    gs.execute("CREATE DATABASE IF NOT EXISTS repdb")
    gs.execute("USE repdb")
    gs.execute("DROP TABLE IF EXISTS r")
    gs.execute("CREATE TABLE r (id BIGINT PRIMARY KEY, v VARCHAR(16))")
    gs.execute("CREATE UNIQUE INDEX rv ON r (v)")
    // plain intra-batch PK dup: last row wins, deterministically
    gs.execute("REPLACE INTO r VALUES (1, 'a'), (1, 'b')")
    assert(gs.query("SELECT id, v FROM repdb.r") == Seq("1 b"))
    // intra-batch unique-INDEX dup across different PKs: (2,'b') first
    // displaces the existing (1,'b') on v, then (3,'b') displaces (2,'b')
    gs.execute("REPLACE INTO r VALUES (2, 'b'), (3, 'b')")
    assert(gs.query("SELECT id, v FROM repdb.r") == Seq("3 b"))
    // chain through BOTH keys: row1=(4,'b') kills (3,'b') on v;
    // row2=(4,'c') kills row1 on PK — so id 3 must stay gone even
    // though the surviving row never carried v='b'
    gs.execute("REPLACE INTO r VALUES (4, 'b'), (4, 'c')")
    assert(gs.query("SELECT id, v FROM repdb.r") == Seq("4 c"))
    // the reverse chain: row1=(4,'d') takes PK 4; row2=(5,'c') takes
    // v='c' from row1? no — row1 is (4,'d'), so row2 displaces the
    // TABLE row (4,'c') on v... which row1 already replaced on PK.
    // Net: both batch rows survive (no shared key between them)
    gs.execute("REPLACE INTO r VALUES (4, 'd'), (5, 'c')")
    assert(gs.query("SELECT id, v FROM repdb.r ORDER BY id") ==
      Seq("4 d", "5 c"))
    // no-PK table with a unique index: displacement and intra-batch
    // last-wins ride the index alone; rows without conflicts all insert
    gs.execute("DROP TABLE IF EXISTS rn")
    gs.execute("CREATE TABLE rn (k BIGINT, v VARCHAR(16))")
    gs.execute("CREATE UNIQUE INDEX rnv ON rn (v)")
    gs.execute("REPLACE INTO rn VALUES (10, 'x'), (11, 'x'), (12, 'y')")
    assert(gs.query("SELECT k, v FROM repdb.rn ORDER BY k") ==
      Seq("11 x", "12 y"))
    // the TRANSACTIONAL route is a separate code path (overlay +
    // applyWrite, not the bucket-pruned rewrite): same row-loop contract
    gs.execute("DROP TABLE IF EXISTS tr")
    gs.execute("CREATE TABLE tr (id BIGINT PRIMARY KEY, v VARCHAR(8))")
    gs.execute("INSERT INTO tr VALUES (1, 'a')")
    gs.executeAll(
      """BEGIN;
         REPLACE INTO tr VALUES (1, 'b'), (1, 'c');
         COMMIT""")
    assert(gs.query("SELECT id, v FROM repdb.tr") == Seq("1 c"))
    gs.execute("USE default")
    gs.execute("DROP DATABASE repdb")
  }

  test("REPLACE works on a table that owns the survivor working-column names") {
    // `__seq` / `__last0` are legal MySQL column names; the survivor
    // ranking must not clobber user columns that collide with its
    // working columns (previously a bare withColumn overwrote them,
    // corrupting both the ranking and the written rows)
    gs.execute("CREATE DATABASE IF NOT EXISTS wcdb")
    gs.execute("USE wcdb")
    gs.execute("DROP TABLE IF EXISTS wc")
    gs.execute("CREATE TABLE wc (id BIGINT PRIMARY KEY, __seq BIGINT, " +
      "__last0 VARCHAR(8))")
    // intra-batch PK dup: the LATER row must win, and its user-column
    // values — including the colliding names — must land intact
    gs.execute("REPLACE INTO wc VALUES (1, 100, 'a'), (1, 200, 'b')")
    assert(gs.query("SELECT id, __seq, __last0 FROM wc") == Seq("1 200 b"))
    // displacement of an existing row still keys on the PK, not on any
    // accidental working-column read
    gs.execute("REPLACE INTO wc VALUES (1, 300, 'c'), (2, 400, 'd')")
    assert(gs.query("SELECT id, __seq, __last0 FROM wc ORDER BY id") ==
      Seq("1 300 c", "2 400 d"))
    // the AUTO_INCREMENT allocators use scratch columns too: __maxid
    // (VALUES route) and __pid/__off (SELECT route, where a collision
    // used to DROP the user column from the written rows)
    gs.execute("CREATE TABLE ai (id BIGINT PRIMARY KEY AUTO_INCREMENT, " +
      "__pid BIGINT, __off BIGINT, __maxid BIGINT)")
    gs.execute("INSERT INTO ai (__pid, __off, __maxid) VALUES (7, 8, 9)")
    gs.execute("INSERT INTO ai (__pid, __off, __maxid) " +
      "SELECT __pid + 10, __off + 10, __maxid + 10 FROM ai")
    assert(gs.query(
      "SELECT id, __pid, __off, __maxid FROM ai ORDER BY id") ==
      Seq("1 7 8 9", "2 17 18 19"))
    // ADMIN CHECK's ±1 multiset probe must survive an INDEXED user
    // column named __d (previously it would have compared constants)
    gs.execute("CREATE TABLE cd (id BIGINT PRIMARY KEY, __d BIGINT)")
    gs.execute("CREATE INDEX cdd ON cd (__d)")
    gs.execute("INSERT INTO cd VALUES (1, 5), (2, 6)")
    assert(gs.query("ADMIN CHECK TABLE cd").forall(_.endsWith("OK")))
    // case variants collide too: Spark resolution is case-insensitive
    // (withColumn("__seq",...) replaces a user __SEQ), so the
    // uniquifier and the checks below must be case-insensitive as well
    gs.execute("CREATE TABLE wcu (id BIGINT PRIMARY KEY, __SEQ BIGINT)")
    gs.execute("REPLACE INTO wcu VALUES (1, 100), (1, 200)")
    assert(gs.query("SELECT id, __SEQ FROM wcu") == Seq("1 200"))
    gs.execute("CREATE TABLE cdu (id BIGINT PRIMARY KEY, __D BIGINT)")
    gs.execute("CREATE INDEX cdud ON cdu (__D)")
    gs.execute("INSERT INTO cdu VALUES (1, 5)")
    assert(gs.query("ADMIN CHECK TABLE cdu").forall(_.endsWith("OK")))
    // __gb is the ONE reservation that cannot be uniquified away — it is
    // the physical bucket partition column of every managed layout. All
    // three routes a user name could reach it (in ANY case) must fail
    // with the clear reserved-name error, leaving table state untouched
    for (stmt <- Seq(
        "CREATE TABLE gbres (id BIGINT PRIMARY KEY, __gb INT)",
        "CREATE TABLE gbres (id BIGINT PRIMARY KEY, __GB INT)",
        "ALTER TABLE cd ADD COLUMN __gb INT",
        "ALTER TABLE cd CHANGE __d __Gb BIGINT")) {
      val e = intercept[IllegalArgumentException](gs.execute(stmt))
      assert(e.getMessage.contains("reserved"), s"$stmt -> ${e.getMessage}")
    }
    assert(gs.query("SELECT id, __d FROM cd ORDER BY id") ==
      Seq("1 5", "2 6"), "rejected DDL must not perturb the table")
    gs.execute("USE default")
    gs.execute("DROP DATABASE wcdb")
  }

  test("reserved __data/__ddlnew table-name suffixes are rejected in any case") {
    // r15 review guard, spec-pinned per the r15 verdict (item 2): a user
    // table ending in __data collides with another table's physical
    // backing table, and one ending in __ddlnew IS the copy-DDL staging
    // name — the next ALTER of the base table would silently DROP it
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    for (stmt <- Seq(
        "CREATE TABLE res__data (id BIGINT PRIMARY KEY)",
        "CREATE TABLE RES__DATA (id BIGINT PRIMARY KEY)",
        "CREATE TABLE res__ddlnew (id BIGINT PRIMARY KEY)",
        "CREATE TABLE Res__DdlNew (id BIGINT PRIMARY KEY)")) {
      val e = intercept[IllegalArgumentException](gs.execute(stmt))
      assert(e.getMessage.contains("reserved"), s"$stmt -> ${e.getMessage}")
    }
    assert(!gs.query("SHOW TABLES").exists(_.toLowerCase.contains("res__")),
      "a rejected CREATE must leave nothing in the catalog")
  }

  test("DDL swap: a crashed run's __ddlnew leftover is hidden, harmless, " +
    "and swept by the next ALTER of the same ref") {
    // the PRE-drop crash window (r15 verdict item 2): the staging table
    // was written but the swap never happened — the original stays live
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS swp")
    gs.execute("CREATE TABLE swp (id BIGINT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO swp VALUES (1, 10), (2, 20)")
    // plant the leftover DIRECTLY — the frontend itself rejects the
    // reserved name, which is exactly why the plant must bypass it
    spark.sql("CREATE TABLE sqlfe.swp__ddlnew__data " +
      "(id BIGINT, v INT, __gb INT) USING parquet")
    assert(!gs.query("SHOW TABLES").exists(_.toLowerCase.contains("ddlnew")),
      "the staging leftover must stay hidden from SHOW TABLES")
    assert(gs.query("ADMIN CHECK TABLE swp").forall(_.endsWith("OK")),
      "a leftover must not perturb the base table's consistency check")
    // the next copy-DDL of the same ref sweeps the leftover and succeeds
    gs.execute("ALTER TABLE swp MODIFY COLUMN v BIGINT")
    assert(gs.query("SELECT id, v FROM swp ORDER BY id") ==
      Seq("1 10", "2 20"))
    assert(!spark.catalog.tableExists("sqlfe.swp__ddlnew__data"),
      "the completed swap must leave the staging name free")
    gs.execute("DROP TABLE swp")
  }

  test("DDL swap: a post-drop crash orphan is recovered at session start") {
    // the POST-drop crash window (r15 ADVICE): old table dropped, rename
    // never ran — the fully-written data sits under the hidden staging
    // name with no base table left to ALTER, so the recreate-time sweep
    // can never reach it; a new session must finish the swap instead
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS orph")
    gs.execute("CREATE TABLE orph (id BIGINT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO orph VALUES (1, 10), (2, 20)")
    // simulate the exact crash state by running the swap's tail by hand:
    // view gone, old phys gone, new data still under the staging name
    spark.sql("DROP VIEW sqlfe.orph")
    spark.sql(
      "ALTER TABLE sqlfe.orph__data RENAME TO sqlfe.orph__ddlnew__data")
    assert(!gs.query("SHOW TABLES").exists(_.contains("orph")),
      "the stranded table must not surface mid-crash")
    // a NEW session completes the interrupted swap on construction
    val gs2 = new GraftSession(spark)
    // the recovery is surfaced, not silent (r16 verdict item 4): the
    // note sits in the diagnostics area until the first non-diagnostic
    // statement — exactly the window a post-crash operator checks
    val notes = gs2.query("SHOW WARNINGS")
    assert(notes.exists(w => w.contains("`sqlfe`.`orph`") &&
      w.contains("interrupted DDL swap")),
      s"session-start recovery must record a SHOW WARNINGS note: $notes")
    assert(gs2.query("SELECT id, v FROM sqlfe.orph ORDER BY id") ==
      Seq("1 10", "2 20"), "recovered table must serve its full data")
    // ...and the data statement above cleared it, like any statement
    assert(!gs2.query("SHOW WARNINGS").exists(_.contains("recovered")))
    assert(spark.catalog.tableExists("sqlfe.orph__data"))
    assert(!spark.catalog.tableExists("sqlfe.orph__ddlnew__data"))
    // the recovered table is fully operational, not just readable
    gs2.execute("USE sqlfe")
    gs2.execute("INSERT INTO orph VALUES (3, 30)")
    assert(gs2.query("SELECT count(*) AS n FROM orph") == Seq("3"))
    gs2.execute("DROP TABLE orph")
  }

  test("DDL swap: a live phys table whose view is missing regains its " +
    "view at session start") {
    // the ADJACENT half-done states (review r16): a crash between the
    // swap's DROP VIEW and DROP TABLE (or after the RENAME, before the
    // view recreate, or mid CREATE TABLE) leaves reachable data behind
    // a missing view — session-start recovery recreates it
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS vless")
    gs.execute("CREATE TABLE vless (id BIGINT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO vless VALUES (1, 10)")
    spark.sql("DROP VIEW sqlfe.vless") // the simulated crash point
    val gs2 = new GraftSession(spark)
    // the resurrect tradeoff is OBSERVABLE (r16 verdict item 4): the
    // note names the table and tells the operator how to finish an
    // intended drop, so a crash mid-DROP TABLE is learnable from the
    // session itself rather than inferred from the table's reappearance
    val notes = gs2.query("SHOW WARNINGS")
    assert(notes.exists(w => w.contains("`sqlfe`.`vless`") &&
      w.contains("missing view") && w.contains("re-issue the DROP")),
      s"view recovery must record a SHOW WARNINGS note: $notes")
    assert(gs2.query("SELECT id, v FROM sqlfe.vless") == Seq("1 10"),
      "view must be recreated over the live phys table")
    gs2.execute("DROP TABLE sqlfe.vless")
  }

  test("backtick-quoted qualified names parse per part") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("CREATE TABLE `sqlfe`.`bt` (id INT PRIMARY KEY, v INT)")
    gs.execute("INSERT INTO `sqlfe`.`bt` VALUES (1, 10)")
    assert(gs.query("SELECT v FROM `sqlfe`.`bt` WHERE id = 1") == Seq("10"))
    gs.execute("DROP TABLE `sqlfe`.`bt`")
    assert(gs.query("SHOW TABLES IN sqlfe LIKE 'bt'").isEmpty ||
      !gs.query("SHOW TABLES IN sqlfe").exists(_.contains("bt")))
  }

  test("unique index enforcement survives case-mixed table spelling") {
    // index metadata compared tableRef with a case-SENSITIVE ==, while
    // Spark resolution is case-insensitive — INSERT INTO a differently
    // cased spelling silently skipped every unique-index probe
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS CaseT")
    gs.execute("CREATE TABLE CaseT (id BIGINT PRIMARY KEY, em VARCHAR(30))")
    gs.execute("CREATE UNIQUE INDEX ux ON CaseT (em)")
    gs.execute("INSERT INTO CaseT VALUES (1, 'a@x.com')")
    val e = intercept[Exception](
      gs.execute("INSERT INTO caset VALUES (2, 'a@x.com')"))
    assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    assert(gs.query("SELECT count(*) AS n FROM CaseT") == Seq("1"))
    gs.execute("DROP TABLE CaseT")
  }

  test("CREATE INDEX resolves column case like MySQL; bad CREATE TABLE index fails whole") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS ci")
    gs.execute("CREATE TABLE ci (id BIGINT PRIMARY KEY, name VARCHAR(20))")
    // case-insensitive resolution (the rest of the file resolves
    // columns case-insensitively; this require was the one holdout)
    gs.execute("CREATE INDEX i1 ON ci (NAME)")
    gs.execute("INSERT INTO ci VALUES (1, 'x')")
    assert(gs.query("SELECT name FROM ci WHERE id = 1") == Seq("x"))
    // a CREATE TABLE whose index clause references a non-column must
    // fail BEFORE the physical create — previously it created the
    // table minus the misparsed column, then died in createIndex
    gs.execute("DROP TABLE IF EXISTS halfT")
    val e = intercept[IllegalArgumentException](gs.execute(
      "CREATE TABLE halfT (id INT, key VARCHAR(10))"))
    assert(e.getMessage.contains("unknown column"), e.getMessage)
    assert(!gs.query("SHOW TABLES").exists(_.contains("halft")),
      "half-created table left behind")
    // the backquoted form MySQL requires parses as a column
    gs.execute("CREATE TABLE halfT (id INT, `key` VARCHAR(10))")
    gs.execute("INSERT INTO halfT VALUES (1, 'k')")
    assert(gs.query("SELECT `key` FROM halfT WHERE id = 1") == Seq("k"))
    gs.execute("DROP TABLE halfT")
    gs.execute("DROP TABLE ci")
  }

  test("NOT NULL without DEFAULT zero-fills on INSERT omission (CREATE = ALTER)") {
    // the reference's zero-datum rule (ddl_test.go:68) applied by the
    // ALTER ADD path; the CREATE path silently wrote NULL into the NOT
    // NULL column instead, so the same declaration behaved differently
    // depending on its origin
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS nn")
    gs.execute("""CREATE TABLE nn (id BIGINT PRIMARY KEY,
        a INT NOT NULL, s VARCHAR(10) NOT NULL, b INT)""")
    gs.execute("INSERT INTO nn (id, b) VALUES (1, 7)")
    assert(gs.query("SELECT id, a, s, b FROM nn") == Seq("1 0  7"))
    gs.execute("DROP TABLE nn")
  }

  test("EXPLAIN REPLACE on a PK + unique-index table shows the real write plan") {
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS er")
    gs.execute("CREATE TABLE er (id BIGINT PRIMARY KEY, em VARCHAR(30))")
    gs.execute("CREATE UNIQUE INDEX uxe ON er (em)")
    gs.execute("INSERT INTO er VALUES (1, 'a@x.com')")
    val plan = gs.query("EXPLAIN REPLACE INTO er VALUES (2, 'a@x.com')")
    // the executed statement displaces via anti-joins on BOTH the PK
    // and the unique index; the explained frame must show that shape
    // (the old Dml.replaceInto rendering had no anti-join at all)
    assert(plan.exists(_.contains("LeftAnti")), plan.mkString("\n"))
    // and EXPLAIN never executes the side effect
    assert(gs.query("SELECT count(*) AS n FROM er") == Seq("1"))
    // the real REPLACE then behaves exactly as explained: row 1
    // displaced through the unique index
    gs.execute("REPLACE INTO er VALUES (2, 'a@x.com')")
    assert(gs.query("SELECT id, em FROM er") == Seq("2 a@x.com"))
    gs.execute("DROP TABLE er")
  }

  test("non-strict integral coercion rounds + saturates, never ANSI-aborts") {
    // toDouble + a bare ANSI cast aborted the whole statement with
    // CAST_OVERFLOW on a huge prefix ('1e300' into BIGINT,
    // '5000000000' into INT) where MySQL clamps with warning 1265;
    // fractional prefixes round half away from zero (the reference's
    // floatStrToIntStr), clamped to the TARGET type's range
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS coi")
    gs.execute("CREATE TABLE coi (id BIGINT PRIMARY KEY, n BIGINT, m INT)")
    gs.execute("SET sql_mode = ''")
    try {
      gs.execute("""INSERT INTO coi VALUES
        (1, '1e300x', '5000000000abc'), (2, '42.9', '-42.9'),
        (3, '-1e300', '-5000000000')""")
      // UNQUOTED numeric sources clamp too (r14 review): these used to
      // ANSI-abort (CAST_OVERFLOW) where MySQL stores the bound with
      // warning 1264
      gs.execute(
        "INSERT INTO coi VALUES (4, 1e300, 5000000000), (5, -1e300, -5000000000)")
      // and in-range LONG values above 2^53 survive EXACTLY — the
      // integral-source clamp works in long space, never through double
      gs.execute("INSERT INTO coi VALUES (6, 9223372036854775806, 3)")
      assert(gs.query("SELECT id, n, m FROM coi ORDER BY id") == Seq(
        s"1 ${Long.MaxValue} ${Int.MaxValue}",
        "2 43 -43",
        s"3 ${Long.MinValue} ${Int.MinValue}",
        s"4 ${Long.MaxValue} ${Int.MaxValue}",
        s"5 ${Long.MinValue} ${Int.MinValue}",
        s"6 ${Long.MaxValue - 1} 3"))
    } finally gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
    gs.execute("DROP TABLE coi")
  }

  test("unmanaged tables honor declared unique indexes on INSERT") {
    // a table created OUTSIDE the frontend takes the unmanaged append
    // path, which used to skip checkUniqueIndexes entirely — the
    // duplicate landed AND refreshIndexes rebuilt the snapshot around
    // it, so ADMIN CHECK reported OK afterwards
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    spark.sql("DROP TABLE IF EXISTS sqlfe.unm")
    spark.sql("CREATE TABLE sqlfe.unm (id BIGINT, em STRING) USING parquet")
    gs.execute("USE sqlfe")
    gs.execute("CREATE UNIQUE INDEX uxu ON unm (em)")
    gs.execute("INSERT INTO unm VALUES (1, 'a@x.com')")
    val e = intercept[Exception](
      gs.execute("INSERT INTO unm VALUES (2, 'a@x.com')"))
    assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    assert(gs.query("SELECT count(*) AS n FROM unm") == Seq("1"))
    spark.sql("DROP TABLE sqlfe.unm")
  }

  test("INSERT…SELECT stages only when a unique-index probe will run") {
    // r13 verdict item 2: the pin-to-parquet stage exists so the unique
    // probe and the append see the same rows of a possibly
    // non-deterministic SELECT — with no unique index there is no
    // probe, and staging was pure 2x write amplification. The stage dir
    // is deleted in a finally, so the spec observes the counter hook.
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    spark.sql("DROP TABLE IF EXISTS sqlfe.usel")
    spark.sql("CREATE TABLE sqlfe.usel (id BIGINT, em STRING) USING parquet")
    gs.execute("USE sqlfe")
    val before = gs.stagedInsertWrites
    gs.execute("INSERT INTO usel SELECT 1, 'a@x.com'")
    assert(gs.stagedInsertWrites == before,
      "a no-unique-index INSERT…SELECT must perform a single direct write")
    assert(gs.query("SELECT count(*) AS n FROM usel") == Seq("1"))
    // declaring a unique index brings the pinned probe back: the stage
    // counter moves AND a duplicate SELECT source still rejects
    gs.execute("CREATE UNIQUE INDEX uxs ON usel (em)")
    val e = intercept[Exception](
      gs.execute("INSERT INTO usel SELECT 2, 'a@x.com'"))
    assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    assert(gs.stagedInsertWrites == before + 1,
      "a with-index INSERT…SELECT must still pin its source")
    assert(gs.query("SELECT count(*) AS n FROM usel") == Seq("1"))
    gs.execute("INSERT INTO usel SELECT 3, 'b@x.com'")
    assert(gs.query("SELECT count(*) AS n FROM usel") == Seq("2"))
    spark.sql("DROP TABLE sqlfe.usel")
  }

  test("UNSIGNED columns clamp at the MySQL range through DDL evolution") {
    // ADVICE r13: the BIGINT UNSIGNED coercion clamp saturated at the
    // widened DECIMAL(20,0)'s ±(10²⁰-1) and clamped negatives to -bound;
    // unsignedness is now tracked past the type mapping so the clamp
    // uses [0, 2⁶⁴-1] like the reference's convert.go. The bulk value
    // matrix lives in CoercionPropertySpec; this case pins the METADATA
    // lifecycle: CREATE, ALTER ADD, MODIFY to signed (ceiling dropped),
    // CHANGE rename (ceiling follows).
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS unsg")
    gs.execute("CREATE TABLE unsg (id BIGINT PRIMARY KEY, u BIGINT UNSIGNED)")
    gs.execute("ALTER TABLE unsg ADD COLUMN iu INT UNSIGNED")
    gs.execute("SET sql_mode = ''")
    try {
      gs.execute(
        "INSERT INTO unsg VALUES (1, '-5', '-1'), (2, '1e300', '4294967296')")
      assert(gs.query("SELECT id, u, iu FROM unsg ORDER BY id") == Seq(
        "1 0 0", "2 18446744073709551615 4294967295"))
      // MODIFY to a signed type drops the ceiling: the same overflow
      // string now saturates at the DECIMAL's own signed range
      gs.execute("ALTER TABLE unsg MODIFY COLUMN u DECIMAL(20,0)")
      gs.execute("INSERT INTO unsg VALUES (3, '-1e300', '7')")
      assert(gs.query("SELECT u FROM unsg WHERE id = 3") ==
        Seq("-99999999999999999999"))
      // CHANGE rename keeps the remaining unsigned column's ceiling
      gs.execute("ALTER TABLE unsg CHANGE COLUMN iu iu2 INT UNSIGNED")
      gs.execute("INSERT INTO unsg VALUES (4, '1', '-9')")
      assert(gs.query("SELECT iu2 FROM unsg WHERE id = 4") == Seq("0"))
    } finally gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
    gs.execute("DROP TABLE unsg")
  }

  test("STRICT sql_mode rejects out-of-declared-range values (1264)") {
    // ADVICE r14: declaredRange was only enforced by the NON-strict
    // clamp — under STRICT mode an in-storage-range but
    // out-of-declared-range value (VALUES (-1) into INT UNSIGNED,
    // 9000000 into MEDIUMINT) stored silently via the plain cast where
    // MySQL's strict convert.go errors with 1264.
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS strg")
    gs.execute(
      "CREATE TABLE strg (id BIGINT PRIMARY KEY, iu INT UNSIGNED, m MEDIUMINT)")
    // boundary values insert cleanly (strict check must not false-fire)
    gs.execute("INSERT INTO strg VALUES (1, 4294967295, 8388607)")
    gs.execute("INSERT INTO strg VALUES (2, 0, -8388608)")
    assert(gs.query("SELECT iu, m FROM strg WHERE id = 1") ==
      Seq("4294967295 8388607"))
    val e1 = intercept[Exception](
      gs.execute("INSERT INTO strg VALUES (3, -1, 0)"))
    assert(chain(e1).contains("Out of range"), chain(e1))
    val e2 = intercept[Exception](
      gs.execute("INSERT INTO strg VALUES (4, 0, 9000000)"))
    assert(chain(e2).contains("Out of range"), chain(e2))
    // INSERT…SELECT sources hit the same in-plan check
    val e3 = intercept[Exception](
      gs.execute("INSERT INTO strg SELECT 5, 4294967296, 0"))
    assert(chain(e3).contains("Out of range"), chain(e3))
    // REPLACE and the INSERT…SET form route through the same
    // buildIncoming fill, so the strict check covers every DML entry
    val e4 = intercept[Exception](
      gs.execute("REPLACE INTO strg VALUES (7, 4294967296, 0)"))
    assert(chain(e4).contains("Out of range"), chain(e4))
    val e5 = intercept[Exception](
      gs.execute("INSERT INTO strg SET id = 8, iu = 0, m = -9000000"))
    assert(chain(e5).contains("Out of range"), chain(e5))
    // rejected statements left nothing behind
    assert(gs.query("SELECT count(*) AS n FROM strg") == Seq("2"))
    // the same values CLAMP with a warning in non-strict mode
    gs.execute("SET sql_mode = ''")
    try {
      gs.execute("INSERT INTO strg VALUES (6, -1, 9000000)")
      assert(gs.query("SELECT iu, m FROM strg WHERE id = 6") ==
        Seq("0 8388607"))
    } finally gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
    gs.execute("DROP TABLE strg")
  }

  test("withScratch restores the current database when the body throws") {
    // a mid-lifecycle statement failure used to park the SHARED session
    // on graft_sql for every later query in the run (r14 review)
    gs.execute("USE default")
    intercept[IllegalArgumentException](
      graft.operators.SqlSurface.withScratch(gs) {
        assert(spark.catalog.currentDatabase == "graft_sql")
        throw new IllegalArgumentException("boom")
      })
    assert(spark.catalog.currentDatabase == "default",
      "scratch database leaked past a failed lifecycle body")
  }

  test("metacharacter-laden string literals survive the statement pipeline") {
    // The front-end preprocesses statements OUTSIDE quotes (comment
    // stripping, user-var substitution, version-comment unwrapping,
    // ';' script splitting) — every one of those metacharacters must
    // stay LITERAL inside a string. Sweep the cross-product through
    // storage (INSERT -> SELECT read-back), session vars (SET @s ->
    // read), and the script splitter (';' inside a literal), so a
    // future preprocessing regex that forgets quote-awareness fails
    // here instead of corrupting stored data.
    gs.execute("CREATE DATABASE IF NOT EXISTS sqlfe")
    gs.execute("USE sqlfe")
    gs.execute("DROP TABLE IF EXISTS meta_lit")
    gs.execute(
      "CREATE TABLE meta_lit (id BIGINT PRIMARY KEY, v VARCHAR(128))")
    val payloads = Seq(
      "-- not a comment", "# not a comment", "/* not dead */",
      "/*!80000 not executable*/", "a;b;c", "@x and @@version stay",
      "`backticks`", "mix -- ; /* @y */ #end", "trailing -- ",
      "it''s quoted") // '' = MySQL-escaped single quote
    payloads.zipWithIndex.foreach { case (p, i) =>
      gs.execute(s"INSERT INTO meta_lit VALUES ($i, '$p')")
    }
    val want = payloads.map(_.replace("''", "'"))
    val got = gs.query("SELECT v FROM meta_lit ORDER BY id")
    assert(got == want, s"stored literals corrupted:\n$got\nvs\n$want")
    // session vars take the same substitution path
    gs.execute("SET @s = '-- ; /* @t */ #'")
    assert(gs.query("SELECT @s AS v") == Seq("-- ; /* @t */ #"))
    // the script splitter must not split inside a literal
    val rs = gs.executeAll(
      "INSERT INTO meta_lit VALUES (100, 'x;y'); SELECT v FROM meta_lit WHERE id = 100")
    assert(rs.size == 2 && rs.last.collect()(0).getString(0) == "x;y")
    gs.execute("DROP TABLE meta_lit")
  }

  test("MySQL /*! version comments execute their body") {
    // the reference lexer treats /*!NNNNN body */ as executable
    // (parser/lexer.go:45 specialComment); passing the markers through
    // let Spark strip the whole thing as an ordinary comment
    assert(gs.query("SELECT /*!80000 1+*/2 AS v") == Seq("3"))
    assert(gs.query("SELECT /*! 1 AS a,*/ 2 AS b") == Seq("1 2"))
    // ordinary comments still strip; hints still pass through; the
    // markers inside string literals stay literal
    assert(gs.query("SELECT /* dead */ 5 AS v") == Seq("5"))
    assert(gs.query("SELECT '/*!99999 x*/' AS v") == Seq("/*!99999 x*/"))
  }
}
