package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Streaming twins must agree with their batch counterparts on the same
  * data (one micro-batch drains the whole parquet file).
  */
class StreamingSpec extends SparkSuite {

  test("streaming windowed counts equal the batch window aggregation") {
    val sq = EventsStream.windowedCounts(spark, sf)
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode("complete").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("wc_stream")
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss")
        .as("win_start"), col("event_type"), col("n"))
    val batch = q("events_window_agg")
      .select(col("win_start"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming exact dedup equals the batch dedup_exact result") {
    // split the corpus into several files so state genuinely accumulates
    // across micro-batches (one file per trigger)
    val split = java.nio.file.Files.createTempDirectory("dedup-split").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(3).write.mode("overwrite").parquet(split)
    val sq = graft.streaming.DedupStream.dedupCounts(
        graft.streaming.DedupStream.source(spark, split, "*.parquet"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(sq.recentProgress.count(_.numInputRows > 0) >= 3,
      "expected one micro-batch per split file")
    val streamed = spark.table("dedup_stream")
    val batch = q("dedup_exact")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming decontaminate equals the batch operator row for row") {
    // eval n-gram set built ONCE from the static corpus (as a real
    // ingest pipeline would pin its benchmark suite), stream split so
    // flagging spans several micro-batches
    val split = java.nio.file.Files.createTempDirectory("decon-split").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(3).write.mode("overwrite").parquet(split)
    val evalHashes = graft.operators.Dedup.evalNgramHashes(
      spark.read.parquet(s"$sf/documents.parquet"))
    val sq = graft.streaming.DedupStream.decontaminate(
        graft.streaming.DedupStream.source(spark, split, "*.parquet"),
        evalHashes)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(sq.recentProgress.count(_.numInputRows > 0) >= 3,
      "expected one micro-batch per split file")
    val streamed = spark.table("decon_stream")
    val batch = q("decontaminate")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // the planted contamination actually fires in-stream
    assert(streamed.filter(col("contaminated")).count() > 0)
  }

  test("streaming delta dedup equals the batch dedup_delta verdicts") {
    import org.apache.spark.sql.types._
    // the incoming batch = the SAME planted construction the batch op
    // uses (shared Dedup.deltaBatchDocs), split across files so
    // classification spans several micro-batches
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val btoks = graft.operators.Dedup.tokens(base)
    val split = java.nio.file.Files.createTempDirectory("delta-split").toString
    graft.operators.Dedup.deltaBatchDocs(base, btoks)
      .repartition(3).write.mode("overwrite").parquet(split)
    val incoming = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(split)
    val sq = graft.streaming.DedupStream.deltaDedup(incoming, base)
      .writeStream.format("memory").queryName("delta_stream")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(sq.recentProgress.count(_.numInputRows > 0) >= 3,
      "expected one micro-batch per split file")
    val streamed = spark.table("delta_stream")
    val batch = q("dedup_delta")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // all three verdicts genuinely occur in-stream
    assert(streamed.select("verdict").distinct().count() == 3)
  }

  test("stream-stream interval join equals the batch attribution pairs") {
    val sq = graft.streaming.EventsStream.attributedPairs(spark, sf)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("attr_stream")
    // the batch twin at pair granularity (events_attribution aggregates)
    val ev = Tables.loadEvents(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_us") >= col("c_us") &&
          col("p_us") - col("c_us") <= 1800L * 1000000L)
      .select(col("user_id"), col("c_us"), col("p_us"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("event-time-timeout sessionization emits closed sessions exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sq = EventsStream.closedSessions(
      in.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      // session 1: user 1 has 2 events 5 min apart; user 2 has 1 event
      in.addData((1L, at(0)), (1L, at(5)), (2L, at(0)))
      sq.processAllAvailable()
      // nothing closed yet — watermark has not passed the gap
      assert(spark.table("closed_sessions").count() == 0)
      // two advancing batches: the first moves the watermark past
      // last_event + 30min gap, the second triggers the timeout sweep
      in.addData((3L, at(120)))
      sq.processAllAvailable()
      in.addData((3L, at(121)))
      sq.processAllAvailable()
      val closed = spark.table("closed_sessions")
        .select("user_id", "start_us", "end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val us = (m: Int) => at(m).getTime * 1000L
      assert(closed == Set(
        (1L, us(0), us(5), 2L),
        (2L, us(0), us(0), 1L)))
    } finally sq.stop()
  }

  test("out-of-order in-watermark event bridges two provisional sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sq = EventsStream.closedSessions(in.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("bridged_sessions")
      .outputMode("append").start()
    try {
      // t=0 and t=35min are >30min apart — provisionally two sessions,
      // but NOTHING may be emitted yet (watermark is only at 25min)
      in.addData((1L, at(0)), (1L, at(35)))
      sq.processAllAvailable()
      assert(spark.table("bridged_sessions").count() == 0)
      // t=28min is above the watermark and bridges both into ONE session
      in.addData((1L, at(28)))
      sq.processAllAvailable()
      in.addData((9L, at(120)))
      sq.processAllAvailable()
      in.addData((9L, at(121)))
      sq.processAllAvailable()
      val us = (m: Int) => at(m).getTime * 1000L
      val closed = spark.table("bridged_sessions")
        .select("user_id", "start_us", "end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(closed == Set((1L, us(0), us(35), 3L)))
    } finally sq.stop()
  }

  test("streaming as-of matches equal the batch join_asof rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.loadEvents(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (col("event_type") === "purchase").as("is_p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._3.getTime) // arrival order = event-time order → no drops
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double, Boolean)]
    val sq = EventsStream.asofMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value", "is_p"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // three time-ordered chunks → real multi-batch watermark advance
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq); sq.processAllAvailable()
      }
      // sentinel click far in the future pushes the watermark past every
      // real purchase; a second batch runs the timeout sweep
      val far = new java.sql.Timestamp(ev.last._3.getTime + 7200000L)
      in.addData((-1L, -1L, far, 0.0, false)); sq.processAllAvailable()
      in.addData((-1L, -2L,
        new java.sql.Timestamp(far.getTime + 60000L), 0.0, false))
      sq.processAllAvailable()
      val streamed = spark.table("asof_stream")
        .select(col("purchase_id"), col("user_id"), col("purchase_us"),
          col("click_id"), col("click_us"),
          // the batch operator emits exact integer cents (ExactNum.cents)
          graft.functions.ExactNum.cents(col("purchase_value"))
            .as("purchase_cents"),
          graft.functions.ExactNum.cents(col("click_value"))
            .as("click_cents"))
      val batch = q("join_asof")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally sq.stop()
  }

  test("as-of match waits for in-watermark clicks between old and purchase") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double, Boolean)]
    val sq = EventsStream.asofMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value", "is_p"))
      .writeStream.format("memory").queryName("asof_ooo")
      .outputMode("append").start()
    try {
      // click@0 and purchase@5 arrive first; the BETTER click@3 arrives
      // out of order in the next batch, still above the watermark
      in.addData((1L, 10L, at(0), 1.0, false), (1L, 11L, at(5), 9.0, true))
      sq.processAllAvailable()
      assert(spark.table("asof_ooo").count() == 0) // not final yet
      in.addData((1L, 12L, at(3), 2.0, false), (2L, 90L, at(30), 0.0, false))
      sq.processAllAvailable()
      in.addData((2L, 91L, at(31), 0.0, false))
      sq.processAllAvailable()
      val rows = spark.table("asof_ooo")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the purchase matched the late-arriving click@3, not click@0
      assert(rows == Set((11L, 12L)))
    } finally sq.stop()
  }

  test("streaming as-of survives NULL event values and matches batch") {
    // the events value column is nullable and the batch operator keeps
    // NULL-value events (only NULL ts is filtered) — the streaming
    // twin's former non-nullable Double fields crashed the encoder on
    // the first NULL (the r12 lmQualityFilter bug class, deferred item
    // (b)). Mutate the fixture exactly like EmptyInputSpec's nullDir
    // (every 9th event's value NULL), run the BATCH join_asof on the
    // mutated dir, and stream the same events through asofMatches.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("asof-nullval").toString
    Tables.loadEvents(spark, sf)
      .withColumn("value",
        when(col("event_id") % 9 === 0, lit(null)).otherwise(col("value")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.loadEvents(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (col("event_type") === "purchase").as("is_p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
      .sortBy(_._3.getTime)
    assert(ev.exists(_._4.isEmpty), "fixture must actually plant NULL values")
    val in =
      MemoryStream[(Long, Long, java.sql.Timestamp, Option[Double], Boolean)]
    val sq = EventsStream.asofMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value", "is_p"))
      .writeStream.format("memory").queryName("asof_nullval")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq); sq.processAllAvailable()
      }
      val far = new java.sql.Timestamp(ev.last._3.getTime + 7200000L)
      in.addData((-1L, -1L, far, Some(0.0), false)); sq.processAllAvailable()
      in.addData((-1L, -2L,
        new java.sql.Timestamp(far.getTime + 60000L), Some(0.0), false))
      sq.processAllAvailable()
      val streamed = spark.table("asof_nullval")
        .select(col("purchase_id"), col("user_id"), col("purchase_us"),
          col("click_id"), col("click_us"),
          graft.functions.ExactNum.cents(col("purchase_value"))
            .as("purchase_cents"),
          graft.functions.ExactNum.cents(col("click_value"))
            .as("click_cents"))
      val batch = SparkEntry.queries("join_asof")(spark, dir)
      assert(streamed.count() > 0)
      // NULL values must flow through to NULL match columns on BOTH sides
      assert(streamed.filter(col("click_cents").isNull
        || col("purchase_cents").isNull).count() > 0,
        "planted NULLs never reached a match — the fixture is too weak")
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally sq.stop()
  }

  test("streaming funnel equals the batch events_funnel rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.loadEvents(spark, sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(_._2.getTime) // arrival order = event-time order → no drops
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sq = EventsStream.funnel(
        in.toDF().toDF("user_id", "ts", "kind"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq); sq.processAllAvailable()
      }
      // sentinel events 4 days out push the watermark past every open
      // conversion window; the second batch runs the timeout sweep
      val far = new java.sql.Timestamp(
        ev.last._2.getTime + 4L * 86400000L)
      in.addData((-1L, far, "click")); sq.processAllAvailable()
      in.addData((-1L,
        new java.sql.Timestamp(far.getTime + 60000L), "click"))
      sq.processAllAvailable()
      val streamed = spark.table("funnel_stream")
      val batch = q("events_funnel")
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
      // exactly-once: one row per user
      assert(streamed.groupBy("user_id").count()
        .filter(col("count") > 1).count() == 0)
    } finally sq.stop()
  }

  test("funnel emits a quiet user whose only view ripens via others") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def at(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sq = EventsStream.funnel(
        in.toDF().toDF("user_id", "ts", "kind"))
      .writeStream.format("memory").queryName("funnel_quiet")
      .outputMode("append").start()
    try {
      // user 1's ONLY event: a view, still above the watermark (wm=0)
      in.addData((1L, at(0), "view")); sq.processAllAvailable()
      assert(spark.table("funnel_quiet").count() == 0)
      // other users push the watermark past view+1d; user 1 never
      // speaks again — only the pending-ripen timeout can emit them
      in.addData((2L, at(30), "view")); sq.processAllAvailable()
      in.addData((2L, at(31), "view")); sq.processAllAvailable()
      in.addData((2L, at(32), "view")); sq.processAllAvailable()
      val rows = spark.table("funnel_quiet")
        .select("user_id", "stages").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 1L)), s"quiet user missing: $rows")
    } finally sq.stop()
  }

  test("stateful sessionization equals the batch lag-window version") {
    // the fixture is mutated with NULL timestamps (every 13th event):
    // a NULL ts crashed the non-nullable Ev.ts_us encoder before the
    // source-side guard (the as-of `value` bug class), while the batch
    // twin's documented policy silently drops timestamp-less events —
    // parity on this dir proves the guard matches that policy exactly
    val dir = java.nio.file.Files.createTempDirectory("sess-nullts").toString
    // events.parquet must be a leaf FILE like the driver ships it (the
    // streaming source's pathGlobFilter matches leaf names): write the
    // single part file to staging and move it into place
    Tables.loadEvents(spark, sf)
      .withColumn("ts",
        when(col("event_id") % 13 === 0, lit(null).cast("timestamp"))
          .otherwise(col("ts")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    val part = new java.io.File(s"$dir/staging").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    assert(spark.read.parquet(s"$dir/events.parquet")
      .filter(col("ts").isNull).count() > 0, "fixture must plant NULL ts")
    val sq = EventsStream.sessionCounts(spark, dir)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("update").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("sess_stream")
    val batch = SparkEntry.queries("events_sessionize")(spark, dir)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("close at lastUs+gap == watermark is safe: Spark drops ts == wm rows") {
    // Pins the boundary semantics the `<=` close condition in
    // closedSessions relies on: Spark's late-row filter for
    // EventTimeTimeout operators drops input rows with ts <= watermark
    // BEFORE the flatMapGroupsWithState function runs (our own manual
    // `>= wmUs` filter would keep the equality row — it never gets the
    // chance). So once wm reaches lastUs + gap, no event that the gap
    // rule could merge (ts <= lastUs + gap) can ever arrive, and
    // closing at equality cannot split a batch-semantics session. If a
    // Spark upgrade ever changes the boundary to strict `<`, this test
    // fails and the close condition must become strict with it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 09:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val us = (m: Int) => at(m).getTime * 1000L
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sq = EventsStream.closedSessions(in.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("boundary_sessions")
      .outputMode("append").start()
    try {
      // watermark lands EXACTLY on session [0,0]'s close boundary
      // (max 40min − 10min delay = 30min = 0 + gap)
      in.addData((1L, at(0)), (9L, at(40)))
      sq.processAllAvailable()
      // at(31) neither merges with [0,0] (31 > 30-min gap) nor moves
      // the watermark (31 < 40); at(30) sits exactly ON the watermark
      // and must be dropped by Spark before the operator sees it
      in.addData((1L, at(31)))
      sq.processAllAvailable()
      in.addData((1L, at(30)))
      sq.processAllAvailable()
      in.addData((9L, at(120)))
      sq.processAllAvailable()
      in.addData((9L, at(121)))
      sq.processAllAvailable()
      val user1 = spark.table("boundary_sessions")
        .where(col("user_id") === 1L)
        .select("start_us", "end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the ts == wm row is late: user 1 keeps TWO sessions, and the
      // dropped event is counted in neither
      assert(user1 == Set((us(0), us(0), 1L), (us(31), us(31), 1L)),
        s"ts == wm boundary semantics changed: $user1")
    } finally sq.stop()
  }

  test("sessionize counts exactly under cross-batch out-of-order arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Ev
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-08-01 10:00:00").getTime * 1000L
    val in = MemoryStream[Ev]
    val sq = EventsStream.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("update").start()
    try {
      // the 10:00 event arrives FIRST, the 09:00 event a batch later:
      // 60 min apart => batch semantics say TWO sessions. A scalar
      // last-timestamp fold would regress its anchor and report one.
      in.addData(Ev(1L, base + 3600L * 1000000L))
      sq.processAllAvailable()
      in.addData(Ev(1L, base))
      sq.processAllAvailable()
      val rows = spark.table("sess_ooo")
        .select("user_id", "n_sessions", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 2L, 2L)),
        s"out-of-order cross-batch events must still count 2 sessions: $rows")
    } finally sq.stop()
  }

  test("as-of state drops users holding neither a safe click nor pending") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-09-01 08:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double, Boolean)]
    val sq = EventsStream.asofMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value", "is_p"))
      .writeStream.format("memory").queryName("asof_state")
      .outputMode("append").start()
    try {
      // user 1 is purchase-only; users 2/3 advance the watermark
      in.addData((1L, 11L, at(0), 5.0, true), (2L, 21L, at(60), 0.0, false))
      sq.processAllAvailable()
      in.addData((3L, 31L, at(120), 0.0, false))
      sq.processAllAvailable() // wm=50min: user 1's purchase ripens unmatched
      in.addData((3L, 32L, at(121), 0.0, false))
      sq.processAllAvailable() // wm=110min: user 2's quiet click compacts
      assert(spark.table("asof_state").count() == 0) // nothing ever matched
      // state must hold exactly user 2 (one compacted safe click) and
      // user 3 (pending clicks) — user 1's vacuous entry is removed,
      // not retained for the life of the query
      val stateRows = sq.recentProgress.reverse
        .flatMap(p => p.stateOperators.headOption).head.numRowsTotal
      assert(stateRows == 2L,
        s"expected 2 state rows (users 2 and 3), got $stateRows")
    } finally sq.stop()
  }

  test("streaming LM/quality ingest filter equals the batch scorers") {
    import org.apache.spark.sql.types._
    val base = spark.read.parquet(s"$sf/documents.parquet")
    // corpus split across 3 files + one OOV doc file: scoring must span
    // micro-batches and the backoff path must fire in-stream
    val split = java.nio.file.Files.createTempDirectory("lmq-split").toString
    base.repartition(3).write.mode("overwrite").parquet(split)
    val oovId = 999999L
    val nullId = 999998L
    locally {
      import spark.implicits._
      Seq((oovId, "zzqx wwvk yyrg", "en", "srcX", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(split)
      // a failed-fetch NULL-text doc: one bad row must not kill the
      // streaming query (unguarded, the tuple encoder NPE'd on
      // size(NULL)); its verdict is the documented all-zero keep row
      Seq((nullId, null: String, "en", "srcX", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(split)
    }
    val incoming = graft.streaming.DedupStream.source(spark, split, "*.parquet")
    val sq = graft.streaming.DedupStream.lmQualityFilter(incoming, base)
      .writeStream.format("memory").queryName("lmq_stream")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(sq.recentProgress.count(_.numInputRows > 0) >= 4,
      "expected one micro-batch per split file")
    val streamed = spark.table("lmq_stream")
    assert(streamed.count() == base.count() + 2)
    val nullRow = streamed.where(col("doc_id") === nullId).collect()(0)
    assert(Seq("n_tokens", "cls_score", "n_bigrams", "logp_micro")
      .forall(c => nullRow.getAs[Long](c) == 0L), nullRow.toString)
    assert(nullRow.getAs[Boolean]("keep"), "no LM evidence -> keep")
    // field-level parity with BOTH batch operators on the corpus docs
    val cls = q("quality_classifier").select(col("doc_id"),
      col("n_tokens").as("b_nt"), col("score").as("b_score"),
      col("keep").as("b_keep"))
    val lm = q("lm_bigram_score").select(col("doc_id"),
      col("n_bigrams").as("b_nb"), col("logp_micro").as("b_lp"))
    val joined = streamed.join(cls, "doc_id").join(lm, "doc_id")
    assert(joined.count() == base.count())
    assert(joined.where(
      col("n_tokens") =!= col("b_nt") || col("cls_score") =!= col("b_score")
        || col("keep") =!= col("b_keep") || col("n_bigrams") =!= col("b_nb")
        || col("logp_micro") =!= col("b_lp")).count() == 0)
    // the OOV doc took the uniform ln(1/V) floor on both its bigrams
    val v = graft.operators.Dedup.tokens(base)
      .select(explode(col("t")).as("w")).distinct().count()
    val qOov = math.floor(math.log(1.0 / v) * 1e6).toLong
    val oov = streamed.where(col("doc_id") === oovId).collect()(0)
    assert(oov.getAs[Long]("n_bigrams") == 2L)
    assert(oov.getAs[Long]("logp_micro") == 2 * qOov)
  }

  test("LM filter with an EMPTY base scores logp 0, never wraps") {
    // bootstrap deployment: the first corpus build has no static base
    // yet. vocabV = 0 made the OOV floor log(1/0) = Inf, whose toLong
    // is Long.MaxValue — so the second OOV bigram WRAPPED the per-doc
    // accumulator negative and the filter emitted arithmetic garbage.
    // Policy now matches the NULL-text verdict row: no model evidence
    // means no LM penalty; the classifier term alone decides keep.
    val split = java.nio.file.Files.createTempDirectory("lmq-empty").toString
    locally {
      import spark.implicits._
      Seq((1L, "three tokens here and more of them", "en", "s", 34L),
          (2L, "two words", "en", "s", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(split)
    }
    val emptyBase = spark.read.parquet(s"$sf/documents.parquet").limit(0)
    val incoming = graft.streaming.DedupStream.source(spark, split, "*.parquet")
    val sq = graft.streaming.DedupStream.lmQualityFilter(incoming, emptyBase)
      .writeStream.format("memory").queryName("lmq_emptybase")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    val rows = spark.table("lmq_emptybase").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("logp_micro") == 0L,
        s"empty-model doc scored ${r.getAs[Long]("logp_micro")}, not 0")
      assert(r.getAs[Long]("n_bigrams") ==
        r.getAs[Long]("n_tokens") - 1, r.toString)
      assert(r.getAs[Boolean]("keep"), "classifier-only keep must pass")
    }
  }
}
