package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational parity operators: scans, projection/filter, joins,
  * aggregation, sort/limit/top-n — SURVEY.md §2.1–§2.6.
  *
  * Each query is declared with the DataFrame API so Catalyst owns pushdown,
  * column pruning, partial aggregation and join-strategy choice (the
  * reference hand-builds all of these: coprocessor pushdown
  * `store/mockstore/mocktikv/cop_handler_dag.go:125-148`, hash join
  * `executor/join.go:31`, partial/final hash agg `executor/aggregate.go:66`,
  * top-n heap `executor/sort.go:148`).
  */
object Relational extends QueryModule {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  override val queries: Seq[Q] = Seq(

    // ── §2.1 scans ────────────────────────────────────────────────────
    // TableReader/TableScan: projection + filter must reach the parquet
    // scan (PushedFilters / pruned ReadSchema) — the Spark analog of the
    // reference's coprocessor scan+selection pushdown.
    Q("scan_pruned",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_quantity > 45 AND l_returnflag = 'R'""")),

    // TableDual (`executor/executor.go:314`): SELECT without FROM.
    Q("scan_dual",
      (s, _) => s.sql("SELECT 1 AS one"),
      Some("SELECT 1 AS one")),

    // ── §2.2 projection / filter ──────────────────────────────────────
    Q("projection_exprs",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        (col("p_size") + 1).as("size_plus"),
        (-col("p_size")).as("size_neg"),
        round4(col("p_retailprice") * 2.0).as("price_x2")),
      Some("""SELECT p_partkey, p_size + 1 AS size_plus, -p_size AS size_neg,
                     (round((p_retailprice * 2.0) * 10000) / 10000.0)
                       AS price_x2 FROM part""")),

    // Selection with a CNF/DNF mix (`executor/executor.go:346`).
    Q("filter_selection",
      (s, d) => t(s, d, "customer")
        .filter((col("c_acctbal") > 1000 && col("c_mktsegment") === "BUILDING")
          || col("c_custkey") < 100)
        .select(col("c_custkey"), col("c_nationkey")),
      Some("""SELECT c_custkey, c_nationkey FROM customer
              WHERE (c_acctbal > 1000 AND c_mktsegment = 'BUILDING')
                 OR c_custkey < 100""")),

    // ── §2.3 joins ────────────────────────────────────────────────────
    // Inner equi-join (HashJoin, `executor/join.go:31`). Shuffled hash /
    // broadcast choice is AQE's at runtime — the scalable default.
    Q("join_inner",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(l("l_orderkey"), l("l_linenumber"), o("o_orderstatus"),
            round(l("l_extendedprice"), 2).as("price"))
      },
      Some("""SELECT l_orderkey, l_linenumber, o_orderstatus,
                     round(l_extendedprice, 2) AS price
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_totalprice > 400000""")),

    // Left outer with residual ON-condition (joiner NULL-padding,
    // `executor/joiner.go:45-117`).
    Q("join_left_outer",
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_quantity") > 49,
            "left")
          .select(o("o_orderkey"), l("l_linenumber"), l("l_quantity"))
      },
      Some("""SELECT o_orderkey, l_linenumber, l_quantity
              FROM orders LEFT JOIN lineitem
                ON o_orderkey = l_orderkey AND l_quantity > 49""")),

    Q("join_right_outer",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        l.join(o, o("o_orderkey") === l("l_orderkey") && l("l_quantity") > 49,
            "right")
          .select(o("o_orderkey"), l("l_linenumber"), l("l_quantity"))
      },
      Some("""SELECT o_orderkey, l_linenumber, l_quantity
              FROM lineitem RIGHT JOIN orders
                ON o_orderkey = l_orderkey AND l_quantity > 49""")),

    // Full outer (beyond the reference's joiner, which stops at
    // left/right — completes the outer-join family; Spark NULL-pads both
    // sides in one shuffled join).
    Q("join_full_outer",
      (s, d) => {
        val c = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "full")
          .select(c("c_custkey"), c("c_name"), o("o_orderkey"),
            round(o("o_totalprice"), 2).as("price"))
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
                     round(o_totalprice, 2) AS price
              FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
              FULL OUTER JOIN
                   (SELECT * FROM orders WHERE o_totalprice > 400000) o
                ON c_custkey = o_custkey""")),

    // Semi/anti joins — the EXISTS / NOT EXISTS plan shape (the reference
    // plans IN-subqueries as semi joins; Spark's leftsemi/leftanti emit
    // the left side once, never multiplying matches).
    Q("join_semi_anti",
      (s, d) => {
        val o = t(s, d, "orders")
        val r = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        def side(how: String, tag: String) =
          o.join(r, o("o_orderkey") === col("l_orderkey"), how)
            .select(o("o_orderkey"), round(o("o_totalprice"), 2).as("price"))
            .withColumn("op", lit(tag))
        side("leftsemi", "semi").unionByName(side("leftanti", "anti"))
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price,
                     'semi' AS op
              FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
                WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey)
              UNION ALL
              SELECT o_orderkey, round(o_totalprice, 2), 'anti'
              FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem
                WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey)""")),

    // Cartesian product (`FROM a, b`; CrossJoin as inner w/o condition,
    // `planner/core/logical_plans.go:48`). Bounded sides only.
    Q("join_cross",
      (s, d) => t(s, d, "nation").crossJoin(t(s, d, "region"))
        .select(col("n_name"), col("r_name")),
      Some("SELECT n_name, r_name FROM nation CROSS JOIN region")),

    // MergeJoin (`executor/merge_join.go:31`): same semantics, forced
    // sort-merge physical strategy via hint.
    Q("join_merge",
      (s, d) => {
        val l = t(s, d, "lineitem").hint("merge")
        val p = t(s, d, "part").filter(col("p_size") === 10)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .select(l("l_orderkey"), l("l_linenumber"), p("p_brand"))
      },
      Some("""SELECT l_orderkey, l_linenumber, p_brand
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size = 10""")),

    // Multi-way join + agg + filter: the flagship slice (SURVEY §7.2.1).
    // region/nation are always-broadcast dims; the lineitem⨝orders⨝customer
    // chain shuffles on its keys — the plan shape that survives 100 TB.
    Q("join_multiway",
      (s, d) => {
        val l = t(s, d, "lineitem").filter(col("l_quantity") > 10)
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        // broadcast policy CONSUMED from the catalog's one declaration
        // (Tables.alwaysBroadcast) instead of restated inline — the set
        // and this plan can no longer drift
        def dim(name: String, df: org.apache.spark.sql.DataFrame) =
          if (Tables.alwaysBroadcast(name)) broadcast(df) else df
        val n = dim("nation", t(s, d, "nation"))
        val r = dim("region", t(s, d, "region").filter(col("r_name") === "ASIA"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("order_cnt"),
            exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"))
      },
      Some(s"""SELECT n_name, count(*) AS order_cnt,
                      ${oracleSum("l_extendedprice * (1 - l_discount)")} AS revenue
               FROM lineitem
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation   ON c_nationkey = n_nationkey
               JOIN region   ON n_regionkey = r_regionkey
               WHERE l_quantity > 10 AND r_name = 'ASIA'
               GROUP BY n_name""")),

    // ── §2.4 aggregation ──────────────────────────────────────────────
    // TPC-H Q1 shape: all six reference agg functions in one grouped agg;
    // Spark plans partial→final automatically (HashAggregateExec modes),
    // matching the reference's partial/final worker split
    // (`executor/aggregate.go:66-133`).
    Q("agg_group",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          avg4(col("l_quantity")).as("avg_qty"),
          avg4(col("l_extendedprice")).as("avg_price"),
          avg4(col("l_discount")).as("avg_disc"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      ${oracleSum("l_quantity")} AS sum_qty,
                      ${oracleSum("l_extendedprice")} AS sum_base_price,
                      ${oracleSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
                      ${oracleAvg("l_quantity")} AS avg_qty,
                      ${oracleAvg("l_extendedprice")} AS avg_price,
                      ${oracleAvg("l_discount")} AS avg_disc,
                      min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
                      count(*) AS count_order
               FROM lineitem
               WHERE l_shipdate <= TIMESTAMP '1998-09-02'
               GROUP BY l_returnflag, l_linestatus""")),

    // Global (ungrouped) aggregate.
    Q("agg_global",
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        exactSum(col("l_quantity")).as("sum_qty"),
        avg4(col("l_extendedprice")).as("avg_price"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok")),
      Some(s"""SELECT count(*) AS cnt,
                      ${oracleSum("l_quantity")} AS sum_qty,
                      ${oracleAvg("l_extendedprice")} AS avg_price,
                      min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
               FROM lineitem""")),

    // Global aggregate over EMPTY input must emit one row: count=0, others
    // NULL (`executor/aggregate.go` isChildReturnEmpty/defaultVal).
    Q("agg_empty_input",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") < 0)
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          max(col("l_orderkey")).as("max_ok")),
      Some("""SELECT count(*) AS cnt, sum(l_quantity) AS sum_qty,
                     max(l_orderkey) AS max_ok
              FROM lineitem WHERE l_quantity < 0""")),

    // SELECT DISTINCT = group-by over all output columns
    // (`planner/core/logical_plan_builder.go:604-616`).
    Q("agg_distinct",
      (s, d) => t(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment")).distinct(),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),

    // firstrow aggregate (`executor/aggfuncs/func_first_row.go`) — made
    // deterministic via min_by on the unique key (reference uses firstrow
    // where any value is acceptable; tests need a stable pick).
    Q("agg_firstrow",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
          count(lit(1)).as("cnt")),
      Some("""SELECT o_custkey, arg_min(o_orderstatus, o_orderkey) AS first_status,
                     count(*) AS cnt
              FROM orders GROUP BY o_custkey""")),

    // ── §2.6 sort / top-n / limit ─────────────────────────────────────
    Q("sort_multi",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        .orderBy(col("bal").desc, col("c_custkey")),
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
              ORDER BY bal DESC, c_custkey""")),

    // TopN (`executor/sort.go:148` bounded heap) → Catalyst
    // TakeOrderedAndProject (per-partition partial top-n, merged — the
    // same distributed shape as the reference's cop-side TopN).
    Q("topn",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .limit(10),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Limit + offset (`executor/executor.go:214`).
    Q("limit_offset",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"))
        .offset(10).limit(20),
      Some("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10"))
  )
}
