package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic surface beyond the reference's parser: window functions, set
  * operations, ROLLUP. The reference documents these as absent
  * (SURVEY §2.5/§2.7), but a complete analytics engine needs them and
  * Spark provides them natively — each query here pins the Spark
  * semantics against the identical ANSI form in DuckDB so the extension
  * surface is oracle-verified like everything else.
  */
object Analytic extends QueryModule {

  override val queries: Seq[Q] = Seq(

    // Ranking + offset + distribution window functions in one pass over
    // orders: one shuffle on the partition key, all six functions
    // evaluated in a single Window stage per frame spec. Ordering keys
    // are made unique (tie-break on o_orderkey) wherever the function is
    // order-sensitive, so results are deterministic; rank/dense_rank get
    // a coarse key so ties actually occur.
    Q("window_funcs",
      (s, d) => {
        val unique = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val ties = Window.partitionBy(col("o_custkey"))
          .orderBy(floor(col("o_totalprice") / 50000))
        Tables.load(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(unique).as("rn"),
          rank().over(ties).as("rk"),
          dense_rank().over(ties).as("drk"),
          lag(col("o_totalprice"), 1).over(unique).as("prev_price"),
          ntile(4).over(unique).as("quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                rank() OVER (PARTITION BY o_custkey
                  ORDER BY floor(o_totalprice / 50000)) AS rk,
                dense_rank() OVER (PARTITION BY o_custkey
                  ORDER BY floor(o_totalprice / 50000)) AS drk,
                lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS prev_price,
                ntile(4) OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS quartile
              FROM orders""")),

    // INTERSECT / EXCEPT (both DISTINCT semantics, as in SQL): customers
    // with a high-value order vs the BUILDING segment. Spark plans both
    // as aggregated joins — no materialized intermediate.
    Q("set_ops",
      (s, d) => {
        val hi = Tables.load(s, d, "orders")
          .filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("custkey"))
        val building = Tables.load(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        hi.intersect(building).withColumn("op", lit("intersect"))
          .unionByName(hi.except(building).withColumn("op", lit("except")))
      },
      Some("""SELECT custkey, 'intersect' AS op FROM (
                SELECT o_custkey AS custkey FROM orders
                WHERE o_totalprice > 300000
                INTERSECT
                SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING') i
              UNION ALL
              SELECT custkey, 'except' AS op FROM (
                SELECT o_custkey AS custkey FROM orders
                WHERE o_totalprice > 300000
                EXCEPT
                SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING') e""")),

    // CUBE over orders: all four grouping combinations of
    // (o_orderstatus, o_orderpriority) in one aggregation — the full
    // grouping-set lattice, complementing events_rollup's prefix
    // hierarchy. Same single map-side-combined pass.
    Q("orders_cube",
      (s, d) => Tables.load(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n_orders"),
          // exact decimal sum (ExactNum): a partition-order double sum
          // can land on a rounding boundary and flip the last digit vs
          // the oracle's exact arithmetic
          graft.functions.ExactNum.exactSum(col("o_totalprice"))
            .as("revenue")),
      Some(s"""SELECT o_orderstatus, o_orderpriority,
                     CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                     CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
                     count(*) AS n_orders,
                     ${graft.functions.ExactNum.oracleSum("o_totalprice")}
                       AS revenue
              FROM orders
              GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ROLLUP over events: per (type, day), per type, and grand total in
    // ONE aggregation (Spark expands the grouping sets before the
    // shuffle; still a single map-side-combined pass). grouping() flags
    // disambiguate rollup NULLs from data NULLs.
    Q("events_rollup",
      (s, d) => Tables.loadEvents(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .rollup(col("event_type"), col("day"))
        .agg(grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("day")).cast("long").as("g_day"),
          count(lit(1)).as("n_events"),
          graft.functions.ExactNum.exactSum(col("value")).as("total_value")),
      Some(s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                     CAST(GROUPING(event_type) AS BIGINT) AS g_type,
                     CAST(GROUPING(strftime(ts, '%Y-%m-%d')) AS BIGINT)
                       AS g_day,
                     count(*) AS n_events,
                     ${graft.functions.ExactNum.oracleSum("value")}
                       AS total_value
              FROM events
              GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))"""))
  )
}
