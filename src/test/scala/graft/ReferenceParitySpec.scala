package graft

/** Reference test-suite parity: the reference's own testkit cases, run
  * verbatim (modulo dialect glue) through the SQL front-end and checked
  * against the reference's expected rows. Sources cited per test; the
  * reference renders NULL as "<nil>", as does GraftSession.query.
  */
class ReferenceParitySpec extends SparkSuite {

  private lazy val gs: GraftSession = {
    val s = new GraftSession(spark)
    s.execute("CREATE DATABASE IF NOT EXISTS refdb")
    s.execute("USE refdb")
    s
  }

  test("constant expressions (executor_test.go:153-160, 255-283)") {
    assert(gs.query("select 1 + 2*3") == Seq("7"))
    assert(gs.query("select 1 order by 1") == Seq("1"))
    assert(gs.query("select nUll") == Seq("<nil>"))
    assert(gs.query("select (null)") == Seq("<nil>"))
    assert(gs.query("select null+NULL") == Seq("<nil>"))
    assert(gs.query("select 'abc'") == Seq("abc"))
  }

  test("every function in the reference registry (builtin.go:332-364)") {
    // common / string
    assert(gs.query("select isnull(NULL), isnull(1)") == Seq("true false"))
    // the dialect's LENGTH counts bytes (builtin_string.go:128); the
    // front-end rewrites it to Spark's octet_length, and CHAR_LENGTH to
    // Spark's character-based length
    assert(gs.query(
      "select length('héllo'), octet_length('héllo'), char_length('héllo')") ==
      Seq("6 6 5"))
    assert(gs.query("select strcmp('a','b'), strcmp('b','a'), strcmp('a','a')") ==
      Seq("-1 1 0"))
    // control
    assert(gs.query("select if(1 < 2, 'y', 'n'), ifnull(NULL, 7)") ==
      Seq("y 7"))
    // logic + comparison + arithmetic + unary
    assert(gs.query(
      "select (1 < 2) and (2 <= 2), (1 > 2) or (2 >= 2), not (1 = 2), 1 != 2") ==
      Seq("true true true true"))
    assert(gs.query("select 7 + 3, 7 - 3, 7 * 3, 7 / 2, -(-5)") ==
      Seq("10 4 21 3.5 5"))
    // division family by zero yields NULL, never an error
    // (builtin_arithmetic.go:471 arithmeticDivide real/int/mod paths)
    assert(gs.query("select 1 / 0, 1 div 0, 1 % 0, 7 div 2, 7 % 3") ==
      Seq("<nil> <nil> <nil> 3 1"))
    // ... including inside CTE bodies and subquery expressions, which a
    // children-only plan walk missed (cteRelations are innerChildren;
    // a subquery's plan is not an expression child) — these used to
    // abort with ANSI DIVIDE_BY_ZERO (r14 review finding)
    assert(gs.query("WITH z AS (SELECT 1/0 AS x) SELECT x FROM z") ==
      Seq("<nil>"))
    assert(gs.query("select (select 1/0), (select 2 % 0)") ==
      Seq("<nil> <nil>"))
    assert(gs.query(
      "select case when 5 in (select 10/0) then 'y' else 'n' end") ==
      Seq("n"))
    // KNOWING delta, pinned (see MySqlDivision scaladoc): the rewrite
    // is Spark's own try_divide replacement, whose TryEval catches the
    // division's whole subtree — an ANSI overflow inside an OPERAND of
    // a division masks to NULL (MySQL errors); the DataFrame path's
    // MySqlCoerce.div (try_divide) behaves identically, so the two
    // entry paths agree. Outside a division, ANSI overflow still raises.
    assert(gs.query(s"select (${Long.MaxValue} + 1) / 1") == Seq("<nil>"))
    val ovf = intercept[Exception](gs.query(
      s"select ${Long.MaxValue} + 1"))
    assert(ovf.getMessage.toLowerCase.contains("overflow"), ovf.getMessage)
    // IN and ROW comparison (rowFunctionClass)
    assert(gs.query("select 2 in (1, 2, 3), 5 in (1, 2, 3)") ==
      Seq("true false"))
    assert(gs.query("select (1, 2) = (1, 2), (1, 2) = (1, 3)") ==
      Seq("true false"))
    assert(gs.query("select (1, 2) in ((1, 2), (3, 4))") == Seq("true"))
    // ordered ROW comparison (builtin.go:361 rowFunctionClass; rewrite
    // planner/core/expression_rewriter.go) — lexicographic by position
    assert(gs.query(
      "select (1, 2) < (1, 3), (1, 2) < (1, 2), (2, 1) >= (1, 9), " +
        "('a', 2) > ('a', 1)") ==
      Seq("true false true true"))
    // SetVar / GetVar
    gs.execute("SET @fn_reg = 11")
    assert(gs.query("select @fn_reg * 2") == Seq("22"))
  }

  test("aggregation over empty and tiny tables (aggregate_test.go:50-68)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS t;
         CREATE TABLE t (a INT, b INT, c INT)""")
    assert(gs.query("select count(a) from t group by a") == Seq())
    assert(gs.query("select count(a) from t") == Seq("0"))
    gs.execute("INSERT INTO t VALUES (0,0,0)")
    assert(gs.query("select distinct b from t") == Seq("0"))
    assert(gs.query("select count(b) from t group by a") == Seq("1"))
    gs.execute("INSERT INTO t VALUES (1,1,1),(3,3,6),(3,2,5),(2,1,4),(1,1,3),(1,1,2)")
    assert(gs.query("select count(a) from t where b>0 group by a, b").sorted ==
      Seq("1", "1", "1", "3"))
    assert(gs.query(
      "select count(a) from t where b>0 group by a, b order by a") ==
      Seq("3", "1", "1", "1"))
    assert(gs.query(
      "select count(a) from t where b>0 group by a, b order by a limit 1") ==
      Seq("3"))
  }

  test("min/max incl. empty input and expressions (aggregate_test.go:73-80)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS te;
         CREATE TABLE te (a INT PRIMARY KEY, b INT)""")
    assert(gs.query("select min(a), min(a) from te") == Seq("<nil> <nil>"))
    gs.execute("INSERT INTO te VALUES (1, -1), (2, -2), (3, 1), (4, NULL)")
    assert(gs.query("select max(a) from te") == Seq("4"))
    assert(gs.query("select min(b) from te") == Seq("-2"))
    assert(gs.query("select max(b*b) from te") == Seq("4"))
    assert(gs.query("select min(b*b) from te") == Seq("1"))
  }

  test("outer-join simplification under WHERE (join_test.go:69-84)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS t;
         DROP TABLE IF EXISTS t1;
         CREATE TABLE t (c1 INT, c2 INT);
         CREATE TABLE t1 (c1 INT, c2 INT);
         INSERT INTO t VALUES (1,1),(2,2);
         INSERT INTO t1 VALUES (2,3),(4,4)""")
    assert(gs.query(
      "select * from t left outer join t1 on t.c1 = t1.c1 where t.c1 = 1 or t1.c2 > 20") ==
      Seq("1 1 <nil> <nil>"))
    assert(gs.query(
      "select * from t1 right outer join t on t.c1 = t1.c1 where t.c1 = 1 or t1.c2 > 20") ==
      Seq("<nil> <nil> 1 1"))
    assert(gs.query(
      "select * from t right outer join t1 on t.c1 = t1.c1 where t.c1 = 1 or t1.c2 > 20") ==
      Seq())
    assert(gs.query(
      "select * from t left outer join t1 on t.c1 = t1.c1 where t1.c1 = 3 or false") ==
      Seq())
    assert(gs.query(
      "select * from t left outer join t1 on t.c1 = t1.c1 and t.c1 != 1 order by t1.c1") ==
      Seq("1 1 <nil> <nil>", "2 2 2 3"))
  }

  test("left join feeding a right join (join_test.go:89-98)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS t1;
         DROP TABLE IF EXISTS t2;
         DROP TABLE IF EXISTS t3;
         CREATE TABLE t1 (c1 INT, c2 INT);
         CREATE TABLE t2 (c1 INT, c2 INT);
         CREATE TABLE t3 (c1 INT, c2 INT);
         INSERT INTO t1 VALUES (1,1), (2,2), (3,3);
         INSERT INTO t2 VALUES (1,1), (3,3), (5,5);
         INSERT INTO t3 VALUES (1,1), (5,5), (9,9)""")
    assert(gs.query(
      """select * from t1 left join t2 on t1.c1 = t2.c1
         right join t3 on t2.c1 = t3.c1
         order by t1.c1, t1.c2, t2.c1, t2.c2, t3.c1, t3.c2""") ==
      Seq("<nil> <nil> <nil> <nil> 5 5", "<nil> <nil> <nil> <nil> 9 9",
        "1 1 1 1 1 1"))
  }

  test("INSERT: auto-increment, DEFAULT, SET form, errors (write_test.go:33-90)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS insert_test;
         CREATE TABLE insert_test (id INT PRIMARY KEY AUTO_INCREMENT,
           c1 INT, c2 INT, c3 INT DEFAULT 1)""")
    gs.execute("insert insert_test (c1) values (1),(2),(NULL)")
    assert(gs.query("select id, c1, c3 from insert_test order by id") ==
      Seq("1 1 1", "2 2 1", "3 <nil> 1"))
    intercept[Exception](
      gs.execute("insert insert_test (c1, c2) values (1,2),(1)"))
    intercept[Exception](gs.execute("insert insert_test (xxx) values (3)"))
    intercept[Exception](gs.execute("insert insert_test_xxx (c1) values (1)"))
    gs.execute("insert insert_test set c1 = 3")
    assert(gs.query("select id, c1, c3 from insert_test where c1 = 3") ==
      Seq("4 3 1"))
    intercept[Exception](gs.execute("insert insert_test set c1 = 4, c1 = 5"))
    gs.executeAll(
      """DROP TABLE IF EXISTS insert_test_1;
         CREATE TABLE insert_test_1 (id INT, c1 INT)""")
    gs.execute("insert insert_test_1 select id, c1 from insert_test")
    assert(gs.query("select count(*) from insert_test_1") == Seq("4"))
  }

  test("NULL into AUTO_INCREMENT assigns the next id (write_test.go:160-205)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ai;
         CREATE TABLE ai (id INT PRIMARY KEY AUTO_INCREMENT, c1 INT)""")
    gs.execute("insert into ai (id, c1) values (NULL, 10)")
    gs.execute("insert into ai (id, c1) values (NULL, 20)")
    gs.execute("insert into ai (id, c1) values (25, 30)")
    gs.execute("insert into ai (id, c1) values (NULL, 40)")
    assert(gs.query("select id, c1 from ai order by c1") ==
      Seq("1 10", "2 20", "25 30", "26 40"))
  }

  test("REPLACE: SET form, key dedup, errors (write_test.go:317-360)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS replace_test;
         CREATE TABLE replace_test (id INT PRIMARY KEY AUTO_INCREMENT,
           c1 INT, c2 INT, c3 INT DEFAULT 1)""")
    gs.execute("replace replace_test (c1) values (1),(2),(NULL)")
    assert(gs.query("select id, c1, c3 from replace_test order by id") ==
      Seq("1 1 1", "2 2 1", "3 <nil> 1"))
    intercept[Exception](gs.execute("replace replace_test (xxx) values (3)"))
    gs.execute("replace replace_test set c1 = 3")
    assert(gs.query("select count(*) from replace_test") == Seq("4"))
    intercept[Exception](gs.execute("replace replace_test set c1 = 4, c1 = 5"))
    // delete-on-duplicate-key: replacing id 1 keeps 4 rows
    gs.execute("replace replace_test (id, c1) values (1, 99)")
    assert(gs.query("select c1 from replace_test where id = 1") == Seq("99"))
    assert(gs.query("select count(*) from replace_test") == Seq("4"))
  }

  test("mixed explicit/NULL auto-increment ids in one batch never collide") {
    gs.executeAll(
      """DROP TABLE IF EXISTS aim;
         CREATE TABLE aim (id INT PRIMARY KEY AUTO_INCREMENT, c1 INT)""")
    gs.execute("insert into aim (id, c1) values (2, 10), (NULL, 20)")
    assert(gs.query("select id, c1 from aim order by c1") ==
      Seq("2 10", "3 20"))
    gs.execute("insert into aim (id, c1) values (25, 30), (NULL, 40), (NULL, 50)")
    assert(gs.query("select id, c1 from aim order by c1") ==
      Seq("2 10", "3 20", "25 30", "26 40", "27 50"))
  }

  test("column lists resolve case-insensitively") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ci;
         CREATE TABLE ci (id INT, v INT);
         INSERT INTO ci (ID, V) VALUES (1, 2)""")
    assert(gs.query("select id, v from ci") == Seq("1 2"))
  }

  test("keywords inside COMMENT strings do not register metadata") {
    gs.executeAll(
      """DROP TABLE IF EXISTS cm;
         CREATE TABLE cm (c INT COMMENT 'default 7 rows AUTO_INCREMENT',
                          d INT DEFAULT 5);
         INSERT INTO cm (c) VALUES (1)""")
    // c has no default and is not auto-increment; d defaults to 5
    assert(gs.query("select c, d from cm") == Seq("1 5"))
    gs.execute("INSERT INTO cm (d) VALUES (9)")
    assert(gs.query("select c, d from cm where d = 9") == Seq("<nil> 9"))
  }

  test("ALTER TABLE ADD COLUMN DEFAULT backfills existing rows") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ad;
         CREATE TABLE ad (id INT);
         INSERT INTO ad VALUES (1)""")
    gs.execute("ALTER TABLE ad ADD COLUMN extra INT DEFAULT 42")
    gs.execute("INSERT INTO ad (id) VALUES (2)")
    // existing AND future rows take the declared default — the
    // reference fills old rows via OriginDefaultValue
    // (ddl/ddl_api.go:1085), as does MySQL
    assert(gs.query("select id, extra from ad order by id") ==
      Seq("1 42", "2 42"))
  }

  test("comments strip anywhere the lexer allows them (parser parity)") {
    assert(gs.query("-- leading note\nselect 1 + 1") == Seq("2"))
    assert(gs.query("select /* inline */ 3 # trailing") == Seq("3"))
    // MySQL requires whitespace after `--`: this is double negation
    assert(gs.query("select 1--2") == Seq("3"))
    assert(gs.query("select '--not a comment' as s") ==
      Seq("--not a comment"))
    gs.executeAll(
      """-- script header
         DROP TABLE IF EXISTS cmt;
         CREATE TABLE cmt (id INT); /* mid */ INSERT INTO cmt VALUES (1); -- tail
         # hash comment
         INSERT INTO cmt VALUES (2)""")
    assert(gs.query("select count(*) from cmt") == Seq("2"))
  }

  test("a CREATE TABLE that fails to parse does not implicitly commit") {
    gs.executeAll(
      """DROP TABLE IF EXISTS pc;
         CREATE TABLE pc (id INT);
         BEGIN;
         INSERT INTO pc VALUES (1)""")
    intercept[Exception](gs.execute("CREATE TABLE pc2 LIKE pc")) // unsupported
    assert(spark.table("refdb.pc").count() == 0) // txn still open
    gs.execute("ROLLBACK")
    assert(gs.query("select count(*) from pc") == Seq("0"))
  }

  test("DDL lifecycles: database, table, index (ddl_test.go:31-66)") {
    gs.execute("CREATE DATABASE IF NOT EXISTS ddl_drop_test")
    gs.execute("DROP DATABASE IF EXISTS ddl_drop_test")
    gs.execute("CREATE DATABASE ddl_drop_test")
    gs.execute("USE ddl_drop_test")
    gs.execute("DROP DATABASE ddl_drop_test")
    // after dropping the current db, unresolved references raise
    intercept[Exception](gs.execute("SELECT * FROM t"))
    gs.execute("USE refdb")
    gs.execute("CREATE TABLE IF NOT EXISTS ddl_t (a INT)")
    gs.execute("DROP TABLE IF EXISTS ddl_t")
    gs.execute("CREATE TABLE ddl_t (a INT)")
    gs.execute("CREATE INDEX idx_a ON ddl_t (a)")
    gs.execute("DROP INDEX idx_a ON ddl_t")
    gs.execute("DROP TABLE ddl_t")
    assert(!spark.catalog.tableExists("refdb.ddl_t"))
  }

  test("ADD COLUMN NOT NULL backfills the zero value (ddl_test.go:68-88)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS nn;
         CREATE TABLE nn (c1 INT);
         INSERT INTO nn VALUES (1), (2)""")
    gs.execute("ALTER TABLE nn ADD COLUMN c2 INT NOT NULL")
    assert(gs.query("select * from nn order by c1") == Seq("1 0", "2 0"))
    // future inserts that omit c2 also take the zero value (the
    // reference's non-strict sql_mode path)
    gs.execute("insert nn (c1) values (3)")
    assert(gs.query("select * from nn order by c1") ==
      Seq("1 0", "2 0", "3 0"))
  }

  test("MODIFY COLUMN widens, never narrows (executor/ddl_test.go:89-108)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS mc;
         CREATE TABLE mc (c1 INT, c2 VARCHAR(10));
         INSERT INTO mc VALUES (1, 'x')""")
    intercept[Exception](gs.execute("alter table mc modify column c1 smallint"))
    gs.execute("alter table mc modify column c1 bigint")
    intercept[Exception](gs.execute("alter table mc modify column c2 blob"))
    gs.execute("alter table mc modify column c2 text")
    val create = gs.query("SHOW CREATE TABLE mc").head
    assert(create.contains("`c1` bigint"), create)
    assert(gs.query("select c1, c2 from mc") == Seq("1 x"))
  }

  test("CHANGE COLUMN replaces the whole definition (db_test.go:646 TestChangeColumn)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS t3;
         CREATE TABLE t3 (a INT DEFAULT '0', b VARCHAR(10),
                          d INT NOT NULL DEFAULT '0')""")
    gs.execute("insert into t3 set b = 'a'")
    assert(gs.query("select a from t3") == Seq("0"))
    // the new definition has no DEFAULT — the old one is dropped, so the
    // next insert leaves aa NULL (reference expects Rows("0", "<nil>"))
    gs.execute("alter table t3 change a aa bigint")
    gs.execute("insert into t3 set b = 'b'")
    assert(gs.query("select aa from t3 order by aa desc") ==
      Seq("0", "<nil>"))
    gs.execute("alter table t3 change d dd bigint not null")
    gs.execute("alter table t3 change b b varchar(20) null default 'c'")
    gs.execute("insert into t3 set aa = 3, dd = 5")
    assert(gs.query("select b from t3 order by b") == Seq("a", "b", "c"))
    // rename onto an existing column name errors (ErrDupFieldName)
    gs.execute("alter table t3 add column a bigint")
    intercept[Exception](gs.execute("alter table t3 change aa a bigint"))
  }

  test("ALTER ... IF EXISTS skips a missing column with a note (db_test.go:1105 TestIfExists)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ife;
         CREATE TABLE ife (a INT PRIMARY KEY, b INT)""")
    gs.execute("alter table ife drop column b")
    intercept[Exception](gs.execute("alter table ife drop column b"))
    gs.execute("alter table ife drop column if exists b")
    assert(gs.query("SHOW WARNINGS").exists(_.contains("1091")))
    intercept[Exception](gs.execute("alter table ife change column b c int"))
    gs.execute("alter table ife change column if exists b c int")
    assert(gs.query("SHOW WARNINGS").exists(_.contains("1054")))
    gs.execute("alter table ife change column if exists a c int")
    gs.execute("alter table ife modify column if exists c bigint")
    assert(gs.query("DESC ife") == Seq("c bigint NO PRI"))
  }

  test("information_schema memtables (infoschema/tables.go, union_scan_test.go:30)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ist;
         CREATE TABLE ist (id BIGINT, v VARCHAR(10))""")
    assert(gs.query(
      "select SCHEMA_NAME from information_schema.schemata where SCHEMA_NAME = 'refdb'") ==
      Seq("refdb"))
    assert(gs.query(
      """select TABLE_NAME, TABLE_TYPE from information_schema.tables
         where TABLE_SCHEMA = 'refdb' and TABLE_NAME = 'ist'""") ==
      Seq("ist BASE TABLE"))
    assert(gs.query(
      """select COLUMN_NAME, ORDINAL_POSITION, DATA_TYPE, IS_NULLABLE
         from information_schema.columns
         where TABLE_SCHEMA = 'refdb' and TABLE_NAME = 'ist'
         order by ORDINAL_POSITION""") ==
      Seq("id 1 bigint YES", "v 2 varchar(255) YES"))
  }

  test("the canonical planner mock schema round-trips (mock.go:40-220)") {
    gs.execute("DROP TABLE IF EXISTS mock_t")
    gs.execute("""CREATE TABLE mock_t (
        a BIGINT PRIMARY KEY,
        b BIGINT,
        c BIGINT, d BIGINT, e BIGINT,
        c_str VARCHAR(64), d_str VARCHAR(64), e_str VARCHAR(64),
        f BIGINT, g BIGINT,
        UNIQUE INDEX c_d_e (c, d, e),
        UNIQUE INDEX e (e),
        UNIQUE INDEX f (f),
        INDEX g (g),
        UNIQUE INDEX f_g (f, g),
        INDEX c_d_e_str (c_str, d_str, e_str),
        INDEX c_d_e_str_prefix (c_str, d_str, e_str(10)))""")
    gs.execute(
      """INSERT INTO mock_t VALUES
         (1, 1, 1, 1, 1, 'a', 'a', 'a', 1, 1),
         (2, 2, 2, 2, 2, 'b', 'b', 'b', 2, 2)""")
    val create = gs.query("SHOW CREATE TABLE mock_t").head
    assert(create.contains("PRIMARY KEY (`a`)"))
    assert(create.contains("UNIQUE KEY `c_d_e` (`c`,`d`,`e`)"))
    assert(create.contains("KEY `c_d_e_str_prefix` (`c_str`,`d_str`,`e_str`)"))
    // every index projection is consistent with the rows
    val checks = gs.query("ADMIN CHECK TABLE mock_t")
    assert(checks.length == 7 && checks.forall(_.endsWith(" OK")), checks)
    assert(gs.query("SELECT count(*) FROM mock_t") == Seq("2"))
  }

  test("ORDER BY alias resolution (executor_test.go:525-550)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS obt;
         CREATE TABLE obt (c INT, d INT);
         INSERT INTO obt VALUES (1,1),(1,2),(1,3)""")
    // alias shadows the column in a bare ORDER BY — both engines agree
    assert(gs.query("select 1-d as d from obt order by d") ==
      Seq("-2", "-1", "0"))
    assert(gs.query("select obt.d from obt order by d") == Seq("1", "2", "3"))
    // KNOWN DIVERGENCE: in `order by d + 1` MySQL resolves d to the
    // UNDERLYING column (expected 0,-1,-2) while Spark resolves to the
    // select alias — we pin Spark's behavior and document the delta
    assert(gs.query("select 1-d as d from obt order by d + 1") ==
      Seq("-2", "-1", "0"))
    // ordering inside a subquery does not constrain the outer result set
    gs.executeAll(
      """DROP TABLE IF EXISTS ob2;
         CREATE TABLE ob2 (a INT, b INT, c INT);
         INSERT INTO ob2 VALUES (1, 2, 3)""")
    assert(gs.query(
      "select b from (select a,b from ob2 order by a,c) t") == Seq("2"))
    assert(gs.query(
      "select b from (select a,b from ob2 order by a,c limit 1) t") == Seq("2"))
  }

  test("merge-join hints preserve duplicate semantics (merge_join_test.go)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS md;
         CREATE TABLE md (c1 INT);
         INSERT INTO md VALUES (1), (1), (1)""")
    // 3×3 duplicate join — 9 rows, with Spark's MERGE hint standing in
    // for the reference's TIDB_SMJ hint
    assert(gs.query(
      "select /*+ MERGE(a) */ * from md a join md b on a.c1 = b.c1") ==
      Seq.fill(9)("1 1"))
    gs.executeAll(
      """DROP TABLE IF EXISTS m1;
         DROP TABLE IF EXISTS m2;
         CREATE TABLE m1 (c1 INT);
         CREATE TABLE m2 (c1 INT);
         INSERT INTO m1 VALUES (1),(2),(3),(4),(5),(6),(7);
         INSERT INTO m2 VALUES (1),(2),(3),(4),(5),(6),(7)""")
    assert(gs.query(
      """select /*+ MERGE(a, b) */ a.c1 from m1 a, m2 b
         where a.c1 = b.c1 order by a.c1""") ==
      (1 to 7).map(_.toString))
  }

  test("multi-table DROP TABLE list (used throughout the reference suites)") {
    gs.executeAll(
      """CREATE TABLE md1 (a INT);
         CREATE TABLE md2 (a INT);
         DROP TABLE IF EXISTS md1, md2, md_never_existed""")
    assert(!spark.catalog.tableExists("refdb.md1"))
    assert(!spark.catalog.tableExists("refdb.md2"))
    assert(gs.query("SHOW WARNINGS").exists(_.contains("1051")))
    // without IF EXISTS: existing tables in the list still drop, the
    // unknown ones are reported once at the end (MySQL behavior)
    gs.execute("CREATE TABLE md3 (a INT)")
    intercept[Exception](gs.execute("DROP TABLE md_gone, md3"))
    assert(!spark.catalog.tableExists("refdb.md3"))
  }

  test("comma-LIMIT matrix over an ordered scan (executor_test.go:1108 TestLimit)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS lim;
         CREATE TABLE lim (a BIGINT, b BIGINT);
         INSERT INTO lim VALUES (1,1),(2,2),(3,3),(4,4),(5,5),(6,6)""")
    assert(gs.query("select * from lim order by a limit 1, 1") == Seq("2 2"))
    assert(gs.query("select * from lim order by a limit 1, 3") ==
      Seq("2 2", "3 3", "4 4"))
    assert(gs.query("select * from lim order by a limit 2, 2") ==
      Seq("3 3", "4 4"))
    assert(gs.query("select * from lim order by a limit 2, 4") ==
      Seq("3 3", "4 4", "5 5", "6 6"))
  }

  test("ROW misuse raises (executor_test.go:584 TestSelectErrorRow)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS er;
         CREATE TABLE er (a INT);
         INSERT INTO er VALUES (1)""")
    intercept[Exception](gs.execute("select row(1, 1) from er"))
    intercept[Exception](gs.execute("select * from er group by row(1, 1)"))
    intercept[Exception](gs.execute("select * from er order by row(1, 1)"))
    intercept[Exception](gs.execute("select (select 1, 1) from er"))
  }

  test("TableDual forms (executor_test.go:820 TestTableDual)") {
    assert(gs.query("Select 1") == Seq("1"))
    assert(gs.query("Select 1 from dual") == Seq("1"))
    assert(gs.query("Select count(*) from dual") == Seq("1"))
    gs.executeAll(
      """DROP TABLE IF EXISTS dua;
         CREATE TABLE dua (a INT PRIMARY KEY)""")
    assert(gs.query(
      "select t1.* from dua t1, dua t2 where t1.a = t2.a and 1 = 0") == Seq())
  }

  test("max-int64 handle + duplicate PK rejection (executor_test.go:1043 TestMaxInt64Handle)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS mx;
         CREATE TABLE mx (id BIGINT, PRIMARY KEY (id));
         INSERT INTO mx VALUES (9223372036854775807)""")
    assert(gs.query("select * from mx where id = 9223372036854775807") ==
      Seq("9223372036854775807"))
    assert(gs.query("select * from mx") == Seq("9223372036854775807"))
    // duplicate primary key errors (the reference's ErrKeyExists)
    intercept[Exception](
      gs.execute("insert into mx values(9223372036854775807)"))
    gs.execute("delete from mx where id = 9223372036854775807")
    assert(gs.query("select * from mx") == Seq())
  }

  test("unique index rejects INSERT conflicts, NULLs exempt (table/tables/index.go ErrKeyExists)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS uqi;
         CREATE TABLE uqi (id BIGINT PRIMARY KEY, v VARCHAR(10),
                           UNIQUE KEY uv (v))""")
    // multiple NULLs never conflict (MySQL unique-index semantics)
    gs.execute("INSERT INTO uqi VALUES (1, 'a'), (2, NULL), (3, NULL)")
    intercept[Exception](gs.execute("INSERT INTO uqi VALUES (4, 'a')"))
    intercept[Exception](
      gs.execute("INSERT INTO uqi VALUES (5, 'x'), (6, 'x')")) // intra-batch
    gs.execute("INSERT INTO uqi VALUES (7, 'b')")
    assert(gs.query("SELECT count(*) FROM uqi") == Seq("4"))
    // inside a transaction the probe sees the overlay state
    gs.executeAll("BEGIN; INSERT INTO uqi VALUES (8, 'c')")
    intercept[Exception](gs.execute("INSERT INTO uqi VALUES (9, 'c')"))
    gs.execute("ROLLBACK")
    assert(gs.query("SELECT count(*) FROM uqi") == Seq("4"))
  }

  test("REPLACE displaces rows conflicting on a unique index (executor/replace.go removeRow)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ruq;
         CREATE TABLE ruq (id BIGINT PRIMARY KEY, v VARCHAR(10),
                           UNIQUE KEY uv (v));
         INSERT INTO ruq VALUES (1, 'a'), (2, 'b')""")
    // new PK, conflicting unique value: the old row (1, 'a') is deleted
    gs.execute("REPLACE INTO ruq VALUES (3, 'a')")
    assert(gs.query("SELECT id, v FROM ruq ORDER BY id") ==
      Seq("2 b", "3 a"))
    // NULL unique values never displace one another
    gs.execute("REPLACE INTO ruq VALUES (4, NULL)")
    gs.execute("REPLACE INTO ruq VALUES (5, NULL)")
    assert(gs.query("SELECT count(*) FROM ruq") == Seq("4"))
    // PK conflict still replaces in place
    gs.execute("REPLACE INTO ruq VALUES (3, 'z')")
    assert(gs.query("SELECT v FROM ruq WHERE id = 3") == Seq("z"))
  }

  test("point-range IN scan (executor_test.go:1058 TestTableScanWithPointRanges)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS pr;
         CREATE TABLE pr (id INT, PRIMARY KEY (id));
         INSERT INTO pr VALUES (1), (5), (10)""")
    assert(gs.query("select * from pr where id in (1, 2, 10) order by id") ==
      Seq("1", "10"))
  }

  test("unsigned BIGINT primary key above 2^63 (executor_test.go:1067 TestUnsignedPk)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS up;
         CREATE TABLE up (id BIGINT UNSIGNED PRIMARY KEY)""")
    gs.execute(
      "insert into up values (9223372036854775808), (9223372036854775809), (1), (2)")
    assert(gs.query("select * from up order by id") ==
      Seq("1", "2", "9223372036854775808", "9223372036854775809"))
    assert(gs.query("select * from up where id not in (2) order by id") ==
      Seq("1", "9223372036854775808", "9223372036854775809"))
  }

  test("IN over quoted numeric strings (executor_test.go:625 TestIn)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ti;
         CREATE TABLE ti (c1 INT PRIMARY KEY, c2 INT)""")
    gs.execute("INSERT INTO ti SELECT id, id FROM range(0, 120)")
    assert(gs.query(
      """select c2 from ti
         where c1 in ('7', '10', '112', '111', '98', '106', '100', '9', '18', '17')
         order by c2""") ==
      Seq("7", "9", "10", "17", "18", "98", "100", "106", "111", "112"))
  }

  test("ORDER BY over aliases (executor_test.go:569 TestOrderBy)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS ob;
         CREATE TABLE ob (c1 INT, c2 INT, c3 VARCHAR(20));
         INSERT INTO ob VALUES (1, 2, 'abc'), (2, 1, 'bcd')""")
    assert(gs.query("select c1 as a, c1 as b from ob order by c1") ==
      Seq("1 1", "2 2"))
    assert(gs.query("select c1 as c2 from ob order by c2") == Seq("1", "2"))
    assert(gs.query("select sum(c1) from ob order by sum(c1)") == Seq("3"))
  }

  test("self joins and comma joins (join_test.go:103-115)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS t;
         DROP TABLE IF EXISTS t1;
         CREATE TABLE t (c1 INT, c2 INT);
         CREATE TABLE t1 (c1 INT, c2 INT);
         INSERT INTO t VALUES (1,1),(2,2),(3,3);
         INSERT INTO t1 VALUES (1,2),(2,3),(3,4)""")
    assert(gs.query("select a.c1 from t a , t1 b where a.c1 = b.c1 order by a.c1") ==
      Seq("1", "2", "3"))
    assert(gs.query(
      "select a.c1 from t a , t1 b where a.c1 = b.c1 and a.c1 + b.c1 > 5 order by b.c1") ==
      Seq("3"))
  }

  test("dirty transaction reads its own writes through every shape (union_scan_test.go:21 TestDirtyTransaction)") {
    // ORDER BY added where the reference relies on implicit PK-scan order
    gs.executeAll(
      """DROP TABLE IF EXISTS t;
         CREATE TABLE t (a INT PRIMARY KEY, b INT)""")
    gs.execute("CREATE INDEX idx_b ON t (b)")
    gs.execute("insert into t values (2, 3), (4, 8), (6, 8)")
    gs.execute("begin")
    assert(gs.query("select * from t order by a") ==
      Seq("2 3", "4 8", "6 8"))
    gs.execute("insert into t values (1, 5), (3, 4), (7, 6)")
    gs.execute("select * from information_schema.columns")
    assert(gs.query("select * from t order by a") ==
      Seq("1 5", "2 3", "3 4", "4 8", "6 8", "7 6"))
    assert(gs.query("select * from t where a = 1") == Seq("1 5"))
    assert(gs.query("select * from t order by a desc") ==
      Seq("7 6", "6 8", "4 8", "3 4", "2 3", "1 5"))
    assert(gs.query("select * from t order by b, a") ==
      Seq("2 3", "3 4", "1 5", "7 6", "4 8", "6 8"))
    assert(gs.query("select * from t order by b desc, a desc") ==
      Seq("6 8", "4 8", "7 6", "1 5", "3 4", "2 3"))
    assert(gs.query("select b from t where b = 8 order by b desc") ==
      Seq("8", "8"))
    // delete a snapshot row and a dirty row
    gs.execute("delete from t where a = 2 or a = 3")
    assert(gs.query("select * from t order by a") ==
      Seq("1 5", "4 8", "6 8", "7 6"))
    assert(gs.query("select * from t order by b, a") ==
      Seq("1 5", "7 6", "4 8", "6 8"))
    // add the deleted rows back
    gs.execute("insert into t values (2, 3), (3, 4)")
    assert(gs.query("select * from t order by a") ==
      Seq("1 5", "2 3", "3 4", "4 8", "6 8", "7 6"))
    gs.execute("commit")
    assert(gs.query("select * from t order by a") ==
      Seq("1 5", "2 3", "3 4", "4 8", "6 8", "7 6"))
    // second scenario: dirty insert must not disturb a snapshot filter
    gs.executeAll(
      """DROP TABLE IF EXISTS t;
         CREATE TABLE t (a INT, b INT)""")
    gs.execute("insert into t values (2, 3), (4, 5), (6, 7)")
    gs.execute("begin")
    gs.execute("insert into t values (0, 1)")
    assert(gs.query("select * from t where b = 3") == Seq("2 3"))
    gs.execute("commit")
  }

  test("multi-statement script with trailing separator (session_test.go:378 TestMultiStmts)") {
    gs.executeAll(
      "drop table if exists t1; create table t1(id int ); insert into t1 values (1);")
    assert(gs.query("select * from t1;") == Seq("1"))
  }

  test("REPLACE SET form and REPLACE..SELECT LIMIT (session_test.go:393 TestReplace)") {
    gs.executeAll(
      """drop table if exists t;
         drop table if exists t1;
         create table t1 (c1 int, c2 int, c3 int)""")
    gs.execute("replace into t1 set c1=1, c2=2, c3=1")
    gs.execute("create table t (c1 int PRIMARY KEY, c2 int, c3 int)")
    gs.execute("replace into t set c1=1, c2=4")
    gs.execute("replace into t select * from t1 limit 1")
    // the selected (1,2,1) displaces the earlier (1,4,NULL) on the PK
    assert(gs.query("select c1, c2, c3 from t") == Seq("1 2 1"))
  }

  test("string literal into an AUTO_INCREMENT pk (session_test.go:406 TestIssue986)") {
    gs.executeAll(
      """DROP TABLE IF EXISTS address;
         CREATE TABLE address (id BIGINT NOT NULL AUTO_INCREMENT PRIMARY KEY)""")
    gs.execute("insert into address values ('10')")
    assert(gs.query("select id from address") == Seq("10"))
  }

  test("GLOBAL-only sysvar reads live global state (set_test.go:23 TestSelectGlobalVar)") {
    val s = new GraftSession(spark) // fresh session: pristine globals
    assert(s.query("select @@global.max_connections") == Seq("151"))
    assert(s.query("select @@max_connections") == Seq("151"))
    s.execute("set @@global.max_connections=100")
    assert(s.query("select @@global.max_connections") == Seq("100"))
    // no session scope for max_connections: the plain read sees the
    // global write (MySQL GLOBAL-only variable semantics)
    assert(s.query("select @@max_connections") == Seq("100"))
    s.execute("set @@global.max_connections=151")
    // unknown system variables are errors, never NULL
    intercept[Exception](s.execute("select @@invalid"))
    intercept[Exception](s.execute("select @@global.invalid"))
  }

  test("strict mode rejects a non-numeric string into a numeric column (insert_test.go:27 TestInsertWrongValueForField)") {
    gs.executeAll(
      """drop table if exists t1;
         create table t1(a bigint)""")
    intercept[Exception](
      gs.execute("insert into t1 values('asfasdfsajhlkhlksdaf')"))
  }
}
