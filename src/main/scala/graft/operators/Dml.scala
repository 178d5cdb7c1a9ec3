package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DML surface — SURVEY.md §2.1 sinks: INSERT, REPLACE, DELETE (the
  * reference has no UPDATE). On immutable parquet these are rewrite-based
  * transformations; the helpers below are the reusable operators, and the
  * queries expose the post-statement table state for the oracle.
  *
  * Scale note: on a real lake these compose with partition-level rewrite
  * (only rewrite partitions containing affected keys); the dataflow shape
  * (union / window-dedup / anti-filter) is unchanged.
  */
object Dml extends QueryModule {

  /** INSERT INTO base SELECT ... (`executor/insert_common.go:340`). */
  def insertInto(base: DataFrame, rows: DataFrame): DataFrame =
    base.unionByName(rows)

  /** DELETE FROM base WHERE cond (`executor/delete.go:28`): rows where
    * cond is TRUE are removed; FALSE and NULL rows are kept.
    */
  def delete(base: DataFrame, cond: Column): DataFrame =
    base.where(!coalesce(cond, lit(false)))

  /** REPLACE INTO (`executor/replace.go:29`): delete-on-duplicate-key —
    * an incoming row replaces any existing row with the same key.
    * Implemented as union + per-key priority dedup (map-side combinable,
    * one shuffle on the key — scalable MERGE shape).
    */
  def replaceInto(base: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    // Scratch names uniquified (case-insensitively) against BOTH input
    // schemas — fixed "__pri"/"__rn" literals violated the freshName
    // invariant and silently overwrote-then-dropped a user column of
    // that name (reachable via EXPLAIN REPLACE on such a table). The
    // intra-batch tie-break is the incoming frame's row order (same
    // last-row-wins contract as the execution path's replaceSurvivors):
    // ordering by priority alone left duplicate-key incoming rows tied
    // and the survivor nondeterministic per run. Scope: the
    // monotonically_increasing_id ordering equals STATEMENT row order
    // only for a deterministic, non-shuffled incoming plan — i.e.
    // literal VALUES-shaped batches. (The SQL frontend no longer routes
    // REPLACE through this helper — it builds the write from its own
    // displacement primitives, SqlFrontend replaceInto — so the
    // remaining callers are the dml_replace query and the specs, both
    // single-stage deterministic inputs; a new caller feeding a
    // shuffled SELECT must supply its own ordering column.)
    val taken = (base.columns ++ incoming.columns).toSet
    val pri = graft.GraftSession.freshName(taken, "__pri")
    val seq = graft.GraftSession.freshName(taken + pri, "__seq")
    val rn = graft.GraftSession.freshName(taken + pri + seq, "__rn")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(pri).desc, col(seq).desc)
    // MySQL REPLACE displacement is a UNIQUE-KEY collision, and NULLs
    // never collide on a unique key: a row with any NULL key column
    // passes through untouched on both sides. Without this guard the
    // window grouped all NULL-key rows into one partition and kept only
    // the newest — silent row loss vs the reference's replace.go.
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    base.withColumn(pri, lit(1)).withColumn(seq, lit(0L))
      .unionByName(incoming.withColumn(pri, lit(2))
        .withColumn(seq, monotonically_increasing_id()))
      .withColumn(rn, row_number().over(w))
      .where(col(rn) === 1 || nullKey)
      .drop(pri, seq, rn)
  }

  override val queries: Seq[Q] = Seq(

    Q("dml_insert_select",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val fromSupplier = Tables.load(s, d, "supplier").select(
          (col("s_suppkey") + 1000000L).as("c_custkey"),
          col("s_name").as("c_name"),
          col("s_nationkey").as("c_nationkey"),
          col("s_acctbal").as("c_acctbal"),
          lit("SUPPLIER").as("c_mktsegment"))
        insertInto(c, fromSupplier).select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("bal"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal,
                     c_mktsegment
              FROM (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                           c_mktsegment FROM customer
                    UNION ALL
                    SELECT s_suppkey + 1000000, s_name, s_nationkey, s_acctbal,
                           'SUPPLIER' FROM supplier)""")),

    Q("dml_delete",
      (s, d) => delete(
          Tables.load(s, d, "orders"),
          col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
      // coalesce mirrors delete()'s NULL handling: a NULL condition row
      // is KEPT (MySQL semantics); a bare NOT(cond) would drop it —
      // NOT(NULL) is NULL, which filters — the moment orders gains a
      // NULL status/price
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
              WHERE NOT coalesce(
                o_orderstatus = 'F' AND o_totalprice < 100000, FALSE)""")),

    Q("dml_replace",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val incoming = c.where(col("c_custkey") % 10 === 0).select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("c_acctbal") + 1000).as("c_acctbal"),
          lit("REPLACED").as("c_mktsegment"))
        replaceInto(c, incoming, Seq("c_custkey")).select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("bal"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal,
                     c_mktsegment
              FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                                 ORDER BY __pri DESC) AS __rn
                    FROM (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                                 c_mktsegment, 1 AS __pri FROM customer
                          UNION ALL
                          SELECT c_custkey, c_name, c_nationkey,
                                 c_acctbal + 1000, 'REPLACED', 2 FROM customer
                          WHERE c_custkey % 10 = 0))
              -- NULL keys never collide (the helper's nullKey
              -- passthrough): SQL PARTITION BY groups NULLs together,
              -- so without this the oracle would keep ONE NULL-key row
              -- where the engine keeps all — fixture custkey is
              -- non-null today, mirrored so a future one degrades
              -- identically
              WHERE __rn = 1 OR c_custkey IS NULL"""))
  )
}
