package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table, batch-first (the same
  * transforms run under Structured Streaming — see graft.streaming).
  * Beyond the reference's surface (it has no streaming/windows, SURVEY
  * §2.10); part of the training-data-pipeline extension set.
  */
object EventsOps extends QueryModule {

  override val queries: Seq[Q] = Seq(

    // Tumbling-window aggregation: groupBy(window(ts)) shuffles once on
    // (window, type) — the shape that scales to 100 TB of logs.
    Q("events_window_agg",
      // ts IS NOT NULL on both sides: Spark's window() silently DROPS a
      // NULL-ts row while DuckDB's time_bucket groups it under a NULL
      // bucket — the explicit filter is the one policy both engines
      // express identically (see join_asof's note)
      (s, d) => Tables.loadEvents(s, d)
        .where(col("ts").isNotNull)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_val"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("n"), col("sum_val")),
      Some(s"""SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
                               '%Y-%m-%d %H:%M:%S') AS win_start,
                      event_type, count(*) AS n,
                      ${oracleSum("value")} AS sum_val
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""")),

    // Semi-structured extraction: JSON props column.
    // Degenerate-props lockstep (r14 review finding): DuckDB's
    // json_extract_string hard-ERRORS on malformed/empty JSON where
    // Spark's get_json_object returns NULL (oracle aborts, Spark
    // green), and a non-integer '$.k' makes DuckDB's BIGINT cast round
    // where Spark's ANSI cast throws (Spark aborts, oracle green).
    // Both sides now parse through double-with-round — NULL on
    // malformed, half-away rounding on fractions (integer-scale dyadic
    // halves, the ExactNum.cents argument) — so any future fixture
    // degrades identically in both engines.
    Q("events_json_extract",
      (s, d) => Tables.loadEvents(s, d)
        .groupBy((round(get_json_object(col("props"), "$.k")
          .try_cast("double")).cast("long") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(round(TRY_CAST(
                       CASE WHEN json_valid(props)
                            THEN json_extract_string(props, '$.k') END
                       AS DOUBLE)) AS BIGINT) % 10 AS k_mod,
                     count(*) AS n
              FROM events GROUP BY 1""")),

    // Interval-join attribution: purchases matched to this user's clicks
    // in the preceding 30 minutes. Equi-join on user_id with a time-range
    // residual — one shuffle on the key, never a cartesian; the streaming
    // twin is a watermarked stream-stream join (EventsStream.attributedPairs,
    // parity pinned in StreamingSpec). Micros arithmetic keeps Spark and
    // the oracle identical.
    Q("events_attribution",
      (s, d) => {
        val ev = Tables.loadEvents(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
        clicks.join(purchases,
            col("user_id") === col("p_user") &&
              col("p_us") >= col("c_us") &&
              col("p_us") - col("c_us") <= 1800L * 1000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT c.user_id, count(*) AS n_pairs
              FROM events c JOIN events p ON c.user_id = p.user_id
              WHERE c.event_type = 'click' AND p.event_type = 'purchase'
                AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 1800000000
              GROUP BY c.user_id""")),

    // As-of join: each purchase picks up the LATEST click at-or-before
    // it for the same user (the classic point-in-time lookup Spark has
    // no operator for). Spark-first shape: union the two tagged event
    // kinds and carry the last click forward with one per-user ordered
    // window — a single sort-shuffle on user_id, linear in events. The
    // naive alternative (range join ts_click <= ts_purchase + per-pair
    // max) explodes to O(clicks × purchases) per user before its
    // aggregate; the union-window form never builds pairs at all, so it
    // survives power-law users at corpus scale. Ordering ties break
    // (ts, kind, event_id)-deterministically: clicks sort before
    // same-timestamp purchases, so an equal-ts click is eligible.
    Q("join_asof",
      (s, d) => {
        // ts IS NOT NULL: a timestamp-less event cannot be time-ordered,
        // and the two engines disagree on where NULLs sort in a window
        // (Spark NULLS FIRST asc, DuckDB NULLS LAST) — filtering them is
        // the one policy both express identically. The carried click is
        // ONE struct, not three per-column last(...ignoreNulls) calls: a
        // latest click whose value is NULL must yield click_value NULL,
        // not silently splice in an OLDER click's value (the streaming
        // twin, which keeps the best click as one tuple, already had
        // these semantics — the per-column form was the divergent side).
        val ev = Tables.loadEvents(s, d)
          .where(col("event_type").isin("click", "purchase")
            && col("ts").isNotNull)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value"),
            when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ck = last(
          when(col("is_p") === 0,
            struct(col("event_id"), col("us"), col("value"))),
          ignoreNulls = true).over(w)
        // money emitted as EXACT integer cents (ExactNum.cents), not
        // round(value, 2): double rounding at 2 dp is engine-divergent
        // on full-precision inputs (Spark shortest-repr HALF_UP vs
        // DuckDB scaled-binary — 0.285 → 0.29 vs 0.28), latent only
        // while the fixture ships exactly-2-dp values. events.value has
        // no decimal contract (unlike TPC-H money columns, 2-dp by
        // spec), so this is the one surface a full-precision driver
        // fixture would turn red. MySqlSemanticsSpec pins the class.
        ev.withColumn("ck", ck)
          .where(col("is_p") === 1 && col("ck").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("us").as("purchase_us"),
            col("ck.event_id").as("click_id"), col("ck.us").as("click_us"),
            cents(col("value")).as("purchase_cents"),
            cents(col("ck.value")).as("click_cents"))
      },
      Some(s"""WITH ev AS (
                SELECT event_id, user_id, epoch_us(ts) AS us, value,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                         AS is_p
                FROM events WHERE event_type IN ('click', 'purchase')
                  AND ts IS NOT NULL),
              j AS (
                SELECT *,
                       last_value(CASE WHEN is_p = 0 THEN struct_pack(
                                    eid := event_id, cus := us, val := value)
                                  END IGNORE NULLS) OVER w AS ck
                FROM ev
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY us, is_p, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW))
              SELECT event_id AS purchase_id, user_id,
                     us AS purchase_us,
                     struct_extract(ck, 'eid') AS click_id,
                     struct_extract(ck, 'cus') AS click_us,
                     ${oracleCents("value")} AS purchase_cents,
                     ${oracleCents("struct_extract(ck, 'val')")} AS click_cents
              FROM j WHERE is_p = 1 AND ck IS NOT NULL""")),

    // Gap-based sessionization (30-min inactivity): lag over a per-user
    // window; partition-parallel by user_id. Epoch-micros ordering keeps
    // Spark (µs timestamps) and the oracle (ns timestamps) identical.
    Q("events_sessionize",
      (s, d) => {
        val us = unix_micros(col("ts"))
        val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
        val lagUs = lag(us, 1).over(w)
        // ts IS NOT NULL: engines disagree on NULL placement in the
        // ordered window (see join_asof's note), and a timestamp-less
        // event belongs to no session anyway
        Tables.loadEvents(s, d)
          .where(col("ts").isNotNull)
          .withColumn("brk",
            when(lagUs.isNull || us - lagUs > 1800L * 1000000L, 1)
              .otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH d AS (
                SELECT user_id,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                 > 1800000000
                            THEN 1 ELSE 0 END AS brk
                FROM events WHERE ts IS NOT NULL
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id))
              SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions,
                     count(*) AS n_events
              FROM d GROUP BY user_id""")),

    // Ordered funnel with conversion windows: first view → first click
    // within 1 day → first purchase within 2 days of that click. Each
    // stage is one filtered aggregate joined back on user_id (the
    // sequence constraint `ts > prev_stage_ts` rides the join) — three
    // user_id-shuffles, no window functions, no driver state; the shape
    // product-analytics funnels take at log scale. Timestamps emitted as
    // epoch micros (exact longs on both engines).
    Q("events_funnel",
      (s, d) => {
        val e = Tables.loadEvents(s, d)
        val s1 = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ts") > col("view_ts") &&
            col("ts") <= col("view_ts") + expr("INTERVAL 1 DAY"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ts") > col("click_ts") &&
            col("ts") <= col("click_ts") + expr("INTERVAL 2 DAY"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
        s1.join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"),
            unix_micros(col("view_ts")).as("view_us"),
            unix_micros(col("click_ts")).as("click_us"),
            unix_micros(col("purchase_ts")).as("purchase_us"),
            (lit(1L) + when(col("click_ts").isNotNull, 1L).otherwise(0L)
              + when(col("purchase_ts").isNotNull, 1L).otherwise(0L))
              .as("stages"))
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS view_ts FROM events
                          WHERE event_type = 'view' GROUP BY user_id),
              s2 AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
                     JOIN s1 ON e.user_id = s1.user_id
                     WHERE e.event_type = 'click' AND e.ts > s1.view_ts
                       AND e.ts <= s1.view_ts + INTERVAL 1 DAY
                     GROUP BY e.user_id),
              s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts
                     FROM events e JOIN s2 ON e.user_id = s2.user_id
                     WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
                       AND e.ts <= s2.click_ts + INTERVAL 2 DAY
                     GROUP BY e.user_id)
              SELECT s1.user_id, epoch_us(view_ts) AS view_us,
                     epoch_us(click_ts) AS click_us,
                     epoch_us(purchase_ts) AS purchase_us,
                     CAST(1 + CASE WHEN click_ts IS NOT NULL
                                   THEN 1 ELSE 0 END
                            + CASE WHEN purchase_ts IS NOT NULL
                                   THEN 1 ELSE 0 END AS BIGINT) AS stages
              FROM s1 LEFT JOIN s2 USING (user_id)
              LEFT JOIN s3 USING (user_id)""")),

    // Pure range join via binning — no equi key at all (unlike
    // events_attribution's user_id + range residual). Semantics: for
    // every event, count OTHER users' events within +-30 s — the
    // concurrency census behind surge/bot detection. A naive range
    // predicate gives Spark a BroadcastNestedLoopJoin (O(n*m) — the
    // 100 TB cliff); instead each probe interval explodes to its <=2
    // covering 60 s bins, the build side keys by its own bin, and the
    // join is a plain shuffled EQUI-join on the bin with the exact
    // |delta| <= 30 residual — candidate volume is bin density squared,
    // tuned by the bin width, never n*m. Each qualifying pair matches
    // in exactly one bin (the point's own), so no dedup pass is needed.
    // Second-resolution integer arithmetic keeps both engines exact.
    Q("join_range_bucketed",
      (s, d) => {
        val base = Tables.loadEvents(s, d)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts) div 1000000").as("sec"))
        val pts = base.select(col("event_id").as("b_id"),
            col("user_id").as("b_user"), col("sec").as("b_sec"))
          .withColumn("bin", expr("b_sec div 60"))
        val iv = base.select(col("event_id").as("a_id"),
            col("user_id").as("a_user"), col("sec").as("a_sec"))
          .withColumn("bin",
            explode(expr("sequence((a_sec - 30) div 60, (a_sec + 30) div 60)")))
        val matched = iv.join(pts, "bin")
          .filter(abs(col("a_sec") - col("b_sec")) <= 30 &&
            col("a_user") =!= col("b_user"))
          .groupBy(col("a_id")).agg(count(lit(1)).as("c"))
        base.select(col("event_id"))
          .join(matched.withColumnRenamed("a_id", "event_id"),
            Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("c"), lit(0L)).as("n_nearby"))
      },
      Some("""WITH e AS (SELECT event_id, user_id,
                     epoch_ns(ts) // 1000000000 AS sec
                   FROM events),
              p AS (SELECT a.event_id, count(*) AS c
                    FROM e a JOIN e b
                      ON abs(a.sec - b.sec) <= 30
                     AND a.user_id <> b.user_id
                    GROUP BY a.event_id)
              SELECT e.event_id, CAST(coalesce(p.c, 0) AS BIGINT) AS n_nearby
              FROM e LEFT JOIN p USING (event_id)"""))
  )
}
