package graft.operators

import graft.{GraftSession, Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-verified coverage of the SQL front-end: every statement class
  * the reference routes through `session.Execute`
  * (tinysql `session/session.go:562`, dispatch
  * `planner/core/planbuilder.go:246-262`) exercised end-to-end via SQL
  * strings and hash-checked against DuckDB.
  */
object SqlSurface extends QueryModule {

  /** Register driver tables as plain-named temp views (the FROM targets
    * the oracle also uses).
    */
  private def session(s: SparkSession, d: String): GraftSession = {
    // one registration definition for the whole repo (events dtype
    // normalization included) — see Meta.registerAll
    Meta.registerAll(s, d, prefix = "")
    new GraftSession(s)
  }

  /** One scratch database for the DML/DDL lifecycle queries. The
    * current-database switch is restored in a FINALLY: a statement
    * failure mid-lifecycle otherwise parked the SHARED session on
    * graft_sql for every later query in the same Verify/Bench run —
    * nothing downstream resolves an unqualified catalog object today,
    * but that invariant held only by accident of query ordering.
    */
  private[graft] def withScratch(gs: GraftSession)(body: => DataFrame): DataFrame =
    try {
      gs.execute("CREATE DATABASE IF NOT EXISTS graft_sql")
      gs.execute("USE graft_sql")
      body
    } finally gs.execute("USE default")

  override val queries: Seq[Q] = Seq(

    // Plain SELECT through the router: parse → analyze → execute, the
    // reference's primary entry path.
    // rev sums an exact DECIMAL (ExactNum rationale): a partition-order
    // double sum can land on a .005 rounding boundary and flip the last
    // digit vs DuckDB's differently-ordered sum. Same ANSI text runs on
    // both engines.
    Q("sql_roundtrip",
      (s, d) => session(s, d).execute(
        """SELECT n_name, count(*) AS n_orders,
                  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE), 2) AS rev
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name"""),
      Some("""SELECT n_name, count(*) AS n_orders,
                     round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DOUBLE), 2) AS rev
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name""")),

    // Session variables driving a real predicate (`executor/set.go:40`,
    // `expression/builtin_other.go:223`).
    Q("sql_session_vars",
      (s, d) => {
        val gs = session(s, d)
        gs.execute("SET @min_bal = 9000")
        gs.execute("SET @seg = 'BUILDING'")
        gs.execute(
          """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
             FROM customer
             WHERE c_acctbal > @min_bal AND c_mktsegment = @seg""")
      },
      Some("""SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
              FROM customer
              WHERE c_acctbal > 9000 AND c_mktsegment = 'BUILDING'""")),

    // TableDual + variable arithmetic + NULL-unset semantics.
    Q("sql_dual_vars",
      (s, d) => {
        val gs = session(s, d)
        gs.execute("SET @a = 6, @b = @a + 1")
        gs.execute(
          """SELECT @a * @b AS answer, @a + @b AS s,
                    @never_set IS NULL AS unset_is_null FROM DUAL""")
      },
      Some("SELECT 42 AS answer, 13 AS s, TRUE AS unset_is_null")),

    // Subqueries through the router: IN (rewritten to a semi join by the
    // optimizer — the reference plans IN-subqueries the same way) plus an
    // uncorrelated scalar subquery in the predicate.
    // The scalar gate is an exact-decimal sum over count, NOT a bare
    // double avg(): a partition-order double aggregate can differ from
    // DuckDB's scan-order sum in the last ULPs (the sql_roundtrip
    // class), flipping the > comparison for a customer whose balance
    // coincides with the mean. The decimal sum is order-independent
    // and < 2^53 cents, so the DOUBLE cast and the division by count
    // are the identical IEEE ops on both engines — same gate value
    // bit-for-bit. Same ANSI text runs on both.
    Q("sql_subquery",
      (s, d) => session(s, d).execute(
        """SELECT c_custkey, round(c_acctbal, 2) AS bal
           FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_totalprice > 400000)
             AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal
                                AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                              FROM customer)"""),
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS bal
              FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders
                                  WHERE o_totalprice > 400000)
                AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal
                                   AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                 FROM customer)""")),

    // Full managed-table DML lifecycle: CREATE → INSERT…SELECT →
    // REPLACE → DELETE → final state (write path of SURVEY §2.1).
    // c_balc (MEDIUMINT cents, r16 verdict item 5) puts the declared-
    // range machinery — the strict-1264 check's pass side and the
    // rounding coercion of a DOUBLE source into a narrow integral —
    // under the cross-engine hash gate: the fixture's cents always fit
    // ±8388607/8, the degenerate pre-flight plants rows whose cents
    // land EXACTLY on both boundaries (through the INSERT and REPLACE
    // entry points), and the oracle recomputes the same
    // round-half-away-from-zero int. (x*100 of a 2-dp money double is
    // never an exact .5, so both engines' nearest-int agree bit-for-
    // bit; the raise side cannot be fixture-gated green by definition
    // and stays property-tested in CoercionPropertySpec.)
    Q("sql_dml_lifecycle",
      (s, d) => {
        val gs = session(s, d)
        withScratch(gs) {
          gs.execute("DROP TABLE IF EXISTS cust")
          gs.execute(
            """CREATE TABLE cust (
                 c_custkey BIGINT NOT NULL PRIMARY KEY,
                 c_name VARCHAR(64),
                 c_acctbal DOUBLE,
                 c_balc MEDIUMINT)""")
          gs.execute(
            """INSERT INTO cust
               SELECT c_custkey, c_name, c_acctbal, c_acctbal * 100
               FROM customer
               WHERE c_custkey <= 200""")
          gs.execute(
            """REPLACE INTO cust
               SELECT c_custkey, c_name, c_acctbal + 1000,
                      (c_acctbal + 1000) * 100
               FROM customer
               WHERE c_custkey <= 50""")
          gs.execute("DELETE FROM cust WHERE c_custkey % 10 = 0")
          gs.execute(
            """SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal,
                      c_balc
               FROM graft_sql.cust""")
        }
      },
      Some("""SELECT c_custkey, c_name,
                     round(c_acctbal +
                       CASE WHEN c_custkey <= 50 THEN 1000 ELSE 0 END, 2) AS bal,
                     CAST(round((c_acctbal +
                       CASE WHEN c_custkey <= 50 THEN 1000 ELSE 0 END) * 100)
                       AS INTEGER) AS c_balc
              FROM customer
              WHERE c_custkey <= 200 AND c_custkey % 10 <> 0""")),

    // SHOW VARIABLES on a fresh session: deterministic defaults.
    Q("sql_show_variables",
      (s, d) => session(s, d).execute("SHOW VARIABLES"),
      Some {
        val rows = GraftSession.defaultSysVars
          .map { case (k, v) => s"('$k', '$v')" }.mkString(", ")
        s"""SELECT * FROM (VALUES $rows) t("Variable_name", "Value")"""
      }),

    // Explicit transaction lifecycle: buffered writes with
    // read-your-own-writes (UnionScan analog, `executor/union_scan.go`),
    // COMMIT durability, ROLLBACK discard.
    Q("sql_txn",
      (s, d) => {
        val gs = session(s, d)
        withScratch(gs) {
          gs.execute("DROP TABLE IF EXISTS txn_t")
          gs.execute(
            "CREATE TABLE txn_t (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR(32))")
          gs.execute("INSERT INTO txn_t SELECT n_nationkey, n_name FROM nation")
          gs.executeAll(
            """BEGIN;
               DELETE FROM txn_t WHERE n_nationkey % 2 = 0;
               INSERT INTO txn_t VALUES (100, 'ATLANTIS');
               COMMIT""")
          gs.executeAll("BEGIN; INSERT INTO txn_t VALUES (200, 'MU'); ROLLBACK")
          gs.execute(
            "SELECT n_nationkey, n_name FROM graft_sql.txn_t")
        }
      },
      Some("""SELECT n_nationkey, n_name FROM nation
              WHERE n_nationkey % 2 <> 0
              UNION ALL SELECT 100, 'ATLANTIS'""")),

    // ALTER TABLE column lifecycle: ADD with DEFAULT backfill → MODIFY
    // retype → CHANGE rename → DROP COLUMN, then a post-DDL insert
    // against the final schema (reference DDL API:
    // ddl/ddl_api.go:1085 add, :1110 drop, :1488 change, :1524 modify).
    Q("sql_ddl_alter",
      (s, d) => {
        val gs = session(s, d)
        withScratch(gs) {
          gs.execute("DROP TABLE IF EXISTS alt")
          gs.execute(
            """CREATE TABLE alt (id BIGINT PRIMARY KEY, v VARCHAR(32),
                 junk INT, region_id INT)""")
          gs.execute(
            """INSERT INTO alt
               SELECT n_nationkey, n_name, 0, CAST(n_regionkey AS INT)
               FROM nation""")
          gs.execute("ALTER TABLE alt ADD COLUMN score DOUBLE DEFAULT 1.5")
          gs.execute("ALTER TABLE alt MODIFY COLUMN region_id BIGINT")
          gs.execute("ALTER TABLE alt CHANGE COLUMN v nation_name VARCHAR(64)")
          gs.execute("ALTER TABLE alt DROP COLUMN junk")
          gs.execute("INSERT INTO alt VALUES (100, 'ATLANTIS', 5, 2.5)")
          gs.execute(
            """SELECT id, nation_name, region_id, round(score, 2) AS score
               FROM graft_sql.alt""")
        }
      },
      Some("""SELECT n_nationkey AS id, n_name AS nation_name,
                     CAST(n_regionkey AS BIGINT) AS region_id,
                     CAST(1.5 AS DOUBLE) AS score
              FROM nation
              UNION ALL
              SELECT CAST(100 AS BIGINT), 'ATLANTIS', CAST(5 AS BIGINT),
                     CAST(2.5 AS DOUBLE)""")),

    // ADMIN COMPACT TABLE (extension): the write path appends files per
    // statement per bucket; compaction folds every multi-file bucket
    // back to one file, with row content untouched — the SELECT after it
    // is oracled against the plain accumulated state.
    Q("sql_compact",
      (s, d) => {
        val gs = session(s, d)
        withScratch(gs) {
          gs.execute("DROP TABLE IF EXISTS cmp")
          gs.execute(
            "CREATE TABLE cmp (o_orderkey BIGINT PRIMARY KEY, o_totalprice DOUBLE)")
          gs.execute(
            """INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderkey <= 400""")
          gs.execute(
            """INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderkey > 400 AND o_orderkey <= 800""")
          gs.execute(
            """INSERT INTO cmp SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderkey > 800 AND o_orderkey <= 1200""")
          gs.execute("ADMIN COMPACT TABLE cmp")
          gs.execute(
            """SELECT o_orderkey, round(o_totalprice, 2) AS price
               FROM graft_sql.cmp""")
        }
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
              FROM orders WHERE o_orderkey <= 1200""")),

    // ADMIN SHOW DDL JOBS (`planner/core/planbuilder.go:439-455`): a
    // nine-job DDL lifecycle, then the session's history through the
    // router. Determinism: the leading DROP IF EXISTS records only when
    // a previous run left the db behind, so the check reads `JOBS 9`
    // (the newest nine = the deterministic lifecycle regardless) and
    // projects the wall-clock-free, id-shift-free columns; the spec
    // covers JOB_ID ordinals and the full 11-column schema.
    Q("sql_admin_show_ddl",
      (s, d) => {
        val gs = session(s, d)
        gs.execute("DROP DATABASE IF EXISTS graft_ddl")
        gs.execute("CREATE DATABASE graft_ddl")
        gs.execute("USE graft_ddl")
        gs.execute("CREATE TABLE jt (id BIGINT PRIMARY KEY, v VARCHAR(32), junk INT)")
        gs.execute("CREATE INDEX vidx ON jt (v)")
        gs.execute("ALTER TABLE jt ADD COLUMN score DOUBLE DEFAULT 1.5")
        gs.execute("ALTER TABLE jt MODIFY COLUMN junk BIGINT")
        gs.execute("ALTER TABLE jt DROP COLUMN junk")
        gs.execute("DROP INDEX vidx ON jt")
        gs.execute("DROP TABLE jt")
        gs.execute("USE default")
        gs.execute("DROP DATABASE graft_ddl")
        gs.execute("ADMIN SHOW DDL JOBS 9")
          .select("DB_NAME", "TABLE_NAME", "JOB_TYPE", "SCHEMA_STATE",
            "SCHEMA_ID", "TABLE_ID", "ROW_COUNT", "STATE")
      },
      Some("""SELECT d AS "DB_NAME", t AS "TABLE_NAME", ty AS "JOB_TYPE",
                     ss AS "SCHEMA_STATE", CAST(si AS BIGINT) AS "SCHEMA_ID",
                     CAST(ti AS BIGINT) AS "TABLE_ID",
                     CAST(0 AS BIGINT) AS "ROW_COUNT", 'synced' AS "STATE"
              FROM (VALUES
                ('graft_ddl', '',   'drop schema',   'none',   1, 0),
                ('graft_ddl', 'jt', 'drop table',    'none',   1, 2),
                ('graft_ddl', 'jt', 'drop index',    'none',   1, 2),
                ('graft_ddl', 'jt', 'drop column',   'none',   1, 2),
                ('graft_ddl', 'jt', 'modify column', 'public', 1, 2),
                ('graft_ddl', 'jt', 'add column',    'public', 1, 2),
                ('graft_ddl', 'jt', 'add index',     'public', 1, 2),
                ('graft_ddl', 'jt', 'create table',  'public', 1, 2),
                ('graft_ddl', '',   'create schema', 'public', 1, 0)
              ) v(d, t, ty, ss, si, ti)""")),

    // CREATE INDEX + ADMIN CHECK TABLE: index↔row consistency job
    // (`planner/core/planbuilder.go:435`).
    Q("sql_admin_check",
      (s, d) => {
        val gs = session(s, d)
        withScratch(gs) {
          gs.execute("DROP TABLE IF EXISTS act")
          gs.execute(
            "CREATE TABLE act (n_nationkey BIGINT PRIMARY KEY, n_name VARCHAR(32))")
          gs.execute(
            "INSERT INTO act SELECT n_nationkey, n_name FROM nation")
          gs.execute("CREATE INDEX nidx ON act (n_name)")
          gs.execute("ADMIN CHECK TABLE act")
        }
      },
      Some("""SELECT * FROM (VALUES ('act', 'nidx', 'OK'))
              t(table_name, index_name, status)"""))
  )
}
