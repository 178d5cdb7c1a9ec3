package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event, with ts pre-converted to epoch micros. */
final case class Ev(user_id: Long, ts_us: Long)

/** An open gap-session's running state (event-time-timeout variant). */
final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

/** A closed session emitted once the watermark passes its gap timeout. */
final case class SessionWindow(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Per-user session summary emitted downstream. */
final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** One funnel event (ts carries the watermark; logic runs in micros). */
final case class FunnelEv(user_id: Long, ts: java.sql.Timestamp,
    ts_us: Long, kind: String)

/** Per-user funnel progress: stage timestamps are final once set (taken
  * only from below-watermark events in time order); `done` is the
  * emitted-once tombstone; `pending` holds in-watermark events.
  */
final case class FunnelState(viewUs: Long, hasView: Boolean,
    clickUs: Long, hasClick: Boolean, purchaseUs: Long,
    hasPurchase: Boolean, done: Boolean, pending: List[FunnelEv])

/** A user's final funnel outcome (matches the batch events_funnel row). */
final case class FunnelRow(user_id: Long, view_us: Long,
    click_us: Option[Long], purchase_us: Option[Long], stages: Long)

/** Structured Streaming over the events table: the streaming twins of the
  * batch EventsOps queries. The reference has no streaming surface
  * (SURVEY §2.10); this is part of the pipeline-extension set. Streaming
  * state is partitioned by group key — the shape that scales horizontally.
  */
object EventsStream {

  /** The ONE gap-rule interval merge both sessionization variants use:
    * sort by (start, last), sweep, join runs whose gap is within
    * `gapUs`. Previously duplicated in [[sessionize]] and
    * [[closedSessions]] with already-drifted sort keys — a future gap
    * fix applied to one copy only is exactly the silent-fork class the
    * shared-helper convention exists to prevent. (The drift was
    * result-neutral: equal-start runs merge to the same intervals
    * under either secondary key.)
    */
  private def mergeSessions(all: List[OpenSession],
      gapUs: Long): List[OpenSession] =
    all.sortBy(s => (s.startUs, s.lastUs))
      .foldLeft(List.empty[OpenSession]) {
        case (prev :: rest, cur) if cur.startUs - prev.lastUs <= gapUs =>
          OpenSession(prev.startUs, math.max(prev.lastUs, cur.lastUs),
            prev.n + cur.n) :: rest
        case (acc, cur) => cur :: acc
      }.reverse

  /** Streaming source over the driver's parquet dir. The ts physical
    * type has varied across driver rounds (TIMESTAMP(NANOS) vs
    * timestamp[us]) — the dtype probe and the normalization expressions
    * are SHARED with the batch loader ([[graft.Tables.eventsTsIsLong]] /
    * [[graft.Tables.normalizeEventsTs]]) so batch and streaming cannot
    * drift on the exact conversion the parity specs depend on; only the
    * explicit schema declaration is streaming-specific (readStream
    * cannot self-discover it).
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val tsLong = graft.Tables.eventsTsIsLong(spark, dir)
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", if (tsLong) LongType else TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    graft.Tables.normalizeEventsTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir),
      tsLong)
  }

  /** Watermarked 5-minute tumbling-window counts (streaming twin of
    * `events_window_agg`).
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Stateful gap-based sessionization via flatMapGroupsWithState
    * (streaming twin of `events_sessionize`): counts sessions per user
    * with a 30-minute inactivity gap.
    *
    * State is the user's merged session INTERVAL list, not just the
    * latest timestamp: a scalar (lastTs, counts) fold is only correct
    * when arrival order across micro-batches is event-time order — an
    * older event landing in a later batch would regress the anchor and
    * mis-count against the true ordering. The interval merge gives
    * exact batch parity under ANY cross-batch arrival order (no
    * watermark here, so nothing is late-dropped). The price is
    * O(sessions per user) state; [[closedSessions]] is the
    * watermark-bounded production shape for unbounded streams, while
    * this update-mode counter favors disorder-exactness.
    */
  def sessionize(events: Dataset[Ev]): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev],
            state: GroupState[List[OpenSession]]) =>
          val fresh = it.map(e => OpenSession(e.ts_us, e.ts_us, 1)).toList
          val merged =
            mergeSessions(state.getOption.getOrElse(Nil) ++ fresh, gapUs)
          state.update(merged)
          Iterator(UserSessions(user, merged.size.toLong,
            merged.map(_.n).sum))
      }
  }

  /** Streaming sessionization wired to the parquet source. ts IS NOT
    * NULL mirrors the batch twin's documented policy (a timestamp-less
    * event belongs to no session, EventsOps events_sessionize) — and
    * without it a NULL ts crashes the non-nullable `Ev.ts_us` encoder
    * on the first bad row, the exact class the as-of `value` fix
    * closed.
    */
  def sessionCounts(spark: SparkSession, dir: String): Dataset[UserSessions] = {
    import spark.implicits._
    sessionize(source(spark, dir)
      .where(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev])
  }

  /** Stream-stream interval join (streaming twin of `events_attribution`):
    * purchases matched to the same user's clicks within the preceding 30
    * minutes. Both sides carry watermarks and the join condition bounds
    * event time in BOTH directions, so Spark can expire join state — the
    * state held per side is O(events inside watermark + interval), not
    * O(stream). Inner join in append mode emits each pair exactly once.
    */
  def attributedPairs(spark: SparkSession, dir: String): DataFrame = {
    val clicks = source(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = source(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"),
        unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"))
  }

  /** One click/purchase event for the streaming as-of join (`ts` carries
    * the watermark through to the stateful operator; the logic works in
    * `ts_us` micros). `value` is Option: the events table's value column
    * is nullable and the batch twin keeps NULL-value events (only NULL
    * ts is filtered) — a non-nullable Double field here made the
    * encoder CRASH on the first NULL value, the same bug class as the
    * r12 lmQualityFilter fix.
    */
  final case class AsofEv(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, ts_us: Long, value: Option[Double],
      is_p: Boolean)

  /** Per-user as-of state: the single best watermark-safe click (no
    * earlier click can ever beat it for any future purchase) plus every
    * event still inside the watermark.
    */
  final case class AsofState(safeUs: Long, safeId: Long,
      safeVal: Option[Double], hasSafe: Boolean, pending: List[AsofEv])

  /** A purchase matched to the latest at-or-before click (emitted once,
    * when the watermark makes the match final). Values stay Option end
    * to end: a matched click whose value is NULL must emit click_value
    * NULL — exactly what the batch struct-carry produces.
    */
  final case class AsofMatch(purchase_id: Long, user_id: Long,
      purchase_us: Long, click_id: Long, click_us: Long,
      purchase_value: Option[Double], click_value: Option[Double])

  /** Streaming twin of the batch `join_asof`: each purchase is matched
    * to the user's LATEST click at-or-before it, emitted exactly once.
    *
    * Finality argument: a purchase's match may only change while a click
    * with `c.us <= p.us` can still arrive; once the watermark passes
    * `p.us` any such click would be below the watermark and is dropped
    * (Spark's EventTimeTimeout late filter drops ts <= wm before the
    * function runs — pinned by StreamingSpec's boundary test; the
    * in-function `>= wmUs` filter is defense-in-depth). So a purchase is
    * emitted when `wm > p.us`, and the emission is final — append mode,
    * no retraction ever needed.
    *
    * State per user is O(events inside one watermark delay) + ONE
    * compacted record: clicks older than the watermark can never beat a
    * newer click for any still-pending purchase, so they fold into the
    * single best (max (us, id)) watermark-safe click. Ties follow the
    * batch operator's (ts, kind, id) order: an equal-timestamp click IS
    * eligible, and among equal-timestamp clicks the higher event_id
    * wins.
    *
    * `events` must carry (user_id, event_id, ts TIMESTAMP, value,
    * is_p BOOLEAN).
    */
  def asofMatches(events: DataFrame): Dataset[AsofMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    // ts IS NOT NULL mirrors the batch join_asof policy (a
    // timestamp-less event cannot be time-ordered) — and without it a
    // NULL ts crashes the non-nullable AsofEv.ts_us encoder, the same
    // class as the value-field fix and the sessionCounts guard
    events.where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("is_p"))
      .withWatermark("ts", "10 minutes")
      .as[AsofEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[AsofEv], state: GroupState[AsofState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(
            AsofState(Long.MinValue, Long.MinValue, None, hasSafe = false, Nil))
          // late data below the watermark is dropped (standard policy);
          // the compacted safe click is always OLDER than every retained
          // event (it was folded under an earlier, smaller watermark), so
          // the carry-forward sweep below starts from it soundly
          val all = st.pending ++ it.filter(_.ts_us >= wmUs)
          val (ripe, pending) = all.partition(_.ts_us < wmUs)
          // sweep ripe events in the batch operator's (ts, kind, id)
          // order, carrying the latest click forward — purchases match
          // exactly what the batch window would have carried at their row
          var best = if (st.hasSafe)
            Some((st.safeUs, st.safeId, st.safeVal)) else None
          val out = List.newBuilder[AsofMatch]
          ripe.sortBy(e => (e.ts_us, e.is_p, e.event_id)).foreach { e =>
            if (!e.is_p) best = Some((e.ts_us, e.event_id, e.value))
            else best.foreach(c => out += AsofMatch(e.event_id, user,
              e.ts_us, c._2, c._1, e.value, c._3))
          }
          val next = AsofState(
            best.map(_._1).getOrElse(Long.MinValue),
            best.map(_._2).getOrElse(Long.MinValue),
            best.flatMap(_._3), best.isDefined, pending)
          if (!next.hasSafe && next.pending.isEmpty)
            // nothing retained and nothing to wait for (a purchase-only
            // user whose purchases all ripened unmatched): remove the
            // entry — a vacuous record per user_id ever seen would
            // otherwise accumulate for the life of the query
            state.remove()
          else {
            state.update(next)
            // wake once the watermark passes the oldest pending EVENT
            // (purchase OR click): purchases must emit even if the user
            // goes quiet, and quiet users' ripened clicks must fold into
            // the one compacted record instead of pending forever
            next.pending.map(_.ts_us).minOption.foreach(us =>
              state.setTimeoutTimestamp(us / 1000L + 1L))
          }
          out.result().iterator
      }
  }

  /** Streaming twin of the batch `events_funnel`: per-user ordered
    * funnel (first view → first click ≤ 1 day later → first purchase
    * ≤ 2 days after that click), emitted EXACTLY ONCE per user, when the
    * outcome is final.
    *
    * Finality argument: stage timestamps are only taken from RIPE events
    * (below the watermark, processed in event-time order), so a stage
    * timestamp is final the moment it is set — no earlier event can
    * still arrive. The only thing worth waiting for is a conversion
    * window still open: stage 1 is not final until the watermark passes
    * view+1d (a qualifying click may yet come), stage 2 until
    * click+2d. An event-time timeout at the open window's boundary
    * makes closure fire even if the user goes quiet. After emission the
    * state keeps a `done` tombstone so a user emits once ever (state is
    * then O(emitted users), the same cardinality as the batch output; a
    * production deployment would TTL tombstones). Users with no view at
    * all (click/purchase-only, or the view dropped as late) never emit
    * and never tombstone: their entry is removed the moment no pending
    * event remains, so they cannot grow state either.
    *
    * Late data below the watermark is dropped on arrival (standard
    * policy, same as the other twins). `events` must carry
    * (user_id LONG, ts TIMESTAMP, kind STRING).
    */
  def funnel(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    events.select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("kind"))
      .withWatermark("ts", "10 minutes")
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(FunnelState(
            0L, hasView = false, 0L, hasClick = false, 0L,
            hasPurchase = false, done = false, Nil))
          val all = st.pending ++ it.filter(_.ts_us >= wmUs)
          val (ripe, pending) = all.partition(_.ts_us < wmUs)
          ripe.sortBy(_.ts_us).foreach { e =>
            if (!st.done) e.kind match {
              case "view" if !st.hasView =>
                st = st.copy(viewUs = e.ts_us, hasView = true)
              case "click" if st.hasView && !st.hasClick &&
                  e.ts_us > st.viewUs && e.ts_us <= st.viewUs + dayUs =>
                st = st.copy(clickUs = e.ts_us, hasClick = true)
              case "purchase" if st.hasClick && !st.hasPurchase &&
                  e.ts_us > st.clickUs && e.ts_us <= st.clickUs + 2 * dayUs =>
                st = st.copy(purchaseUs = e.ts_us, hasPurchase = true)
              case _ => ()
            }
          }
          val out =
            if (st.done || !st.hasView) None
            else if (st.hasPurchase)
              Some(FunnelRow(user, st.viewUs, Some(st.clickUs),
                Some(st.purchaseUs), 3L))
            else if (st.hasClick && wmUs > st.clickUs + 2 * dayUs)
              Some(FunnelRow(user, st.viewUs, Some(st.clickUs), None, 2L))
            else if (!st.hasClick && wmUs > st.viewUs + dayUs)
              Some(FunnelRow(user, st.viewUs, None, None, 1L))
            else None
          st = st.copy(done = st.done || out.isDefined,
            // a done user's pending events can never matter again —
            // dropping them keeps tombstone state truly O(1) per user
            pending = if (st.done || out.isDefined) Nil else pending)
          if (!st.done && !st.hasView && st.pending.isEmpty)
            // view-less users (click/purchase-only, or the view dropped
            // as late) hold no emittable progress once pending drains:
            // remove the entry instead of leaking default state forever.
            // A later view recreates it fresh with identical semantics.
            state.remove()
          else {
            state.update(st)
            if (!st.done) {
              // wake at the open window's boundary AND when the oldest
              // pending event ripens — a user whose only activity is a
              // still-in-watermark view would otherwise never be invoked
              // again (no new data, no timeout) and never emit
              val wake =
                (if (st.hasView)
                   Seq(if (st.hasClick) st.clickUs + 2 * dayUs
                       else st.viewUs + dayUs)
                 else Nil) ++ st.pending.map(_.ts_us).minOption
              wake.minOption.foreach(us =>
                state.setTimeoutTimestamp(us / 1000L + 1L))
            }
          }
          out.iterator
      }
  }

  /** Gap-based sessionization with an EVENT-TIME timeout: a session is
    * emitted exactly once, only after the WATERMARK passes its
    * 30-minute inactivity gap — the production shape for "emit finished
    * sessions downstream" (append mode), complementing [[sessionize]]'s
    * running per-user counters (update mode).
    *
    * State holds EVERY not-yet-safe session as an interval list (merged
    * by the gap rule), never just the latest: an intra-batch gap must
    * NOT emit immediately, because an out-of-order event still above
    * the watermark may yet extend or bridge those sessions. Events at
    * or below the watermark are dropped — by Spark's own
    * EventTimeTimeout late filter before the function runs (pinned by
    * StreamingSpec's boundary test), with the in-function filter as
    * defense-in-depth. State size is
    * O(sessions inside one watermark delay) per user.
    *
    * `events` must have columns (user_id LONG, ts TIMESTAMP); event time
    * is kept in true microseconds end to end, matching the batch
    * `events_sessionize` arithmetic.
    */
  def closedSessions(events: DataFrame): Dataset[SessionWindow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    events.select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], SessionWindow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[List[OpenSession]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // merge stored sessions + fresh in-watermark events by the
          // shared gap rule ([[mergeSessions]])
          val fresh = it.map(_._3).filter(_ >= wmUs)
            .map(t => OpenSession(t, t, 1)).toList
          val merged =
            mergeSessions(state.getOption.getOrElse(Nil) ++ fresh, gapUs)
          // a session is safe once no in-watermark event can extend it.
          // `<=` is correct AT equality because Spark's own late-row
          // filter for EventTimeTimeout operators drops rows with
          // ts <= watermark BEFORE they reach this function (pinned by
          // StreamingSpec's boundary test): when wm == lastUs + gap, an
          // extender would need ts <= lastUs + gap == wm and so can
          // never arrive. (Our `>= wmUs` keep-filter above is the
          // documented manual policy, but the equality row is already
          // gone at the operator boundary.)
          val (closed, open) = merged.partition(_.lastUs + gapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // clamp past the current watermark: an open session has
            // lastUs + gap > wm in MICROS, but the ms-truncated wake
            // time (lastUs/1000 + gapMs) can still equal wmMs when
            // lastUs carries sub-ms digits, and Spark rejects
            // event-time timeouts at or before the watermark
            state.setTimeoutTimestamp(math.max(
              open.map(_.lastUs).min / 1000L + gapUs / 1000L,
              state.getCurrentWatermarkMs()) + 1L)
          }
          closed.iterator
            .map(s => SessionWindow(user, s.startUs, s.lastUs, s.n))
      }
  }
}
