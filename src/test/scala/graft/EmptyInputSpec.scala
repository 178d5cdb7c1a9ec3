package graft

import org.apache.spark.sql.functions.col

/** Empty-input robustness: every declared query must ANALYZE and run
  * against zero-row copies of all ten tables. At scale an empty source
  * is routine (a filter, a partition, a date range matching nothing),
  * and two classes of failure hide from the row-ful driver gate:
  * plan-time errors from literals built off empty collects (the r11
  * find: zero Lloyd centroids rendered an untyped `array()` —
  * VOID-typed, analysis error — in ann_ivf/dedup_semantic), and
  * driver-side head()/reduce() on empty aggregates. The whole
  * 107-query surface sweeps here; results may be empty or a single
  * all-NULL/zero aggregate row, but never an exception.
  */
class EmptyInputSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {

  // every fixture dir this suite materializes, removed in afterAll —
  // repeated local runs were accumulating full table copies in /tmp
  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  private def newTempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tempDirs.synchronized { tempDirs += d }
    d
  }
  override def afterAll(): Unit = {
    tempDirs.foreach(d =>
      GraftSession.deleteRecursively(java.nio.file.Paths.get(d)))
    super.afterAll()
  }

  private def fixtureDir(rows: Int): String = {
    val d = newTempDir("graft-sfdegen")
    Tables.names.foreach { t =>
      spark.read.parquet(Tables.path(sf, t)).limit(rows)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }
  private lazy val emptyDir: String = fixtureDir(0)
  private lazy val oneRowDir: String = fixtureDir(1)

  private def sweep(dir: String): Unit = {
    val failures = SparkEntry.selectNames(None).flatMap { n =>
      try { SparkEntry.queries(n)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(n -> Option(e.getMessage).getOrElse(e.toString).take(200))
      }
    }
    assert(failures.isEmpty, failures.map { case (n, m) =>
      s"$n :: ${m.replaceAll("\\s+", " ")}" }.mkString("\n"))
  }

  test("every query survives an all-empty source dir") { sweep(emptyDir) }

  test("every query survives 1-row tables (degenerate joins, 1-sample stats)") {
    // single-partition, single-row relations: windows over one row,
    // BPE over one document, FK joins that match nothing, aggregates
    // with one sample — all legal shapes a filtered corpus produces
    sweep(oneRowDir)
  }

  private lazy val nullDir: String = {
    val d = newTempDir("graft-sfnull")
    import org.apache.spark.sql.functions.{concat, lit, when}
    Tables.names.foreach { t =>
      val base = spark.read.parquet(Tables.path(sf, t))
      val mutated = t match {
        case "documents" =>
          // explicit code points (not source literals): U+1F355 pizza
          // (astral, 4-byte UTF-8), U+00E9 é, U+6771 東, U+10348 Gothic
          val astral = Seq(0x1F355, 0x20, 0x63, 0x61, 0x66, 0xE9, 0x20,
            0x6771, 0x20, 0x10348)
            .map(cp => new String(Character.toChars(cp))).mkString
          base.withColumn("text",
            when(col("doc_id") % 4 === 0, lit(null))
              .when(col("doc_id") % 7 === 0, lit(""))
              .when(col("doc_id") % 5 === 0,
                concat(col("text"), lit(" " + astral)))
              .otherwise(col("text")))
        case "embeddings" =>
          base.withColumn("embedding",
            when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("embedding")))
        case "events" =>
          // routine telemetry shapes: unnamed events, missing payloads
          base.withColumn("event_type",
              when(col("event_id") % 6 === 0, lit(null))
                .otherwise(col("event_type")))
            .withColumn("value",
              when(col("event_id") % 9 === 0, lit(null))
                .otherwise(col("value")))
            .withColumn("props",
              when(col("event_id") % 11 === 0, lit(null))
                .otherwise(col("props")))
        case _ => base
      }
      mutated.write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query survives NULL/empty/astral text and NULL vectors") {
    // real corpora carry all three: failed fetches (NULL text), empty
    // pages, and non-BMP unicode. The r11 finds this sweep locks in:
    // block/chunk builders died on sequence(1, 0, step) for 0-token
    // docs (dedup_cdc's unguarded sequence(1, 0) even DESCENDS), and
    // zero/NULL vectors reaching the Lloyd seed collect put a null Seq
    // into the centroid literals (MatchError in ann_ivf/dedup_semantic)
    sweep(nullDir)
  }

  private lazy val hugeDocDir: String = {
    // The opposite tail of the degenerate axis (r11 verdict item 4):
    // one multi-megabyte document. A single 100 MB crawl page is
    // routine at 100 TB, and the per-row HOF representations (token
    // array → shingle/gram/winnow/BPE-repr transforms) hold O(doc
    // length) arrays per ROW — the classic executor-OOM / straggler
    // input that a row-COUNT-degenerate sweep can never reach. The
    // fixture plants a 1,000,000-token (~7.8 MB) document with a 50k
    // word vocabulary; SCALE.md records the 4M-token probe and the
    // extrapolated 100 MB posture.
    val d = newTempDir("graft-sfhuge")
    import org.apache.spark.sql.functions.lit
    val text = (0 until 1000000)
      .map(i => "w" + ((i * 2654435761L) % 50021)).mkString(" ")
    Tables.names.foreach { t =>
      val base = spark.read.parquet(Tables.path(sf, t))
      val mutated =
        if (t == "documents")
          // doc_id 999 stays in the original id space (< 1M), so the
          // planted-duplicate and prefix-copy corpora replicate the
          // huge doc too — the pair-emitting and component paths see
          // huge-doc PAIRS, not just a huge singleton
          base.unionByName(base.sparkSession.range(1).select(
            lit(999L).as("doc_id"), lit(text).as("text"),
            lit("en").as("lang"), lit("crawl").as("source"),
            lit(text.length.toLong).as("n_chars")))
        else base
      mutated.write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query survives one 1M-token (~8 MB) document") {
    sweep(hugeDocDir)
    // spot exactness on the giant row: the linear single-pass counters
    // must come back exact, not truncated or overflowed
    val row = SparkEntry.queries("text_token_count")(spark, hugeDocDir)
      .where(col("doc_id") === 999L).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Number]("ws_tokens").longValue == 1000000L,
      s"giant row miscounted: ${row(0)}")
  }

  test("a NULL-embedding seed window leaves the Lloyd loop skippable") {
    // sharper than the all-NULL case: the corpus HAS non-NULL vectors,
    // but every seed row (vec_id < k = 8) carries a NULL embedding — a
    // routine shape when one encode batch fails. Zero seeds must skip
    // Lloyd refinement (previously the NULL-cell group's getInt NPE'd
    // at runtime) and degrade to cell-less results: ann_ivf probes
    // nothing, dedup_semantic flags nothing.
    val d = newTempDir("graft-sfnullseed")
    import org.apache.spark.sql.functions.{lit, when}
    Tables.names.foreach { t =>
      val base = spark.read.parquet(Tables.path(sf, t))
      val mutated =
        if (t == "embeddings")
          base.withColumn("embedding",
            when(col("vec_id") < 8, lit(null)).otherwise(col("embedding")))
        else base
      mutated.write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    val ivf = SparkEntry.queries("ann_ivf")(spark, d)
    assert(ivf.count() == 0L, "no quantizer -> no probed cells -> no rows")
    val sem = SparkEntry.queries("dedup_semantic")(spark, d).collect()
    assert(sem.nonEmpty, "non-NULL vectors must still be reported")
    assert(sem.forall(!_.getAs[Boolean]("is_dup")),
      "no quantizer -> no cell cohabitation -> nothing may flag")
  }

  test("NULL-text docs language-classify as 'und', never the argmax fallback") {
    // NULL counts fail every >= comparison, so an unguarded when-chain
    // fell through to the final otherwise and labeled failed fetches
    // 'zh' in BOTH engines — agreeing, so only a semantic assertion
    // (not the parity gate) can catch it
    val preds = SparkEntry.queries("text_langid")(spark, nullDir)
      .where(col("doc_id") % 4 === 0)
      .select("pred_lang").distinct().collect().map(_.getString(0))
    assert(preds.toSeq == Seq("und"), preds.mkString(","))
  }

  test("NULL-text docs rank behind content in the stratified quota") {
    // Spark ascending sort defaults NULLS FIRST, DuckDB NULLS LAST: an
    // unpinned ORDER BY md5(text) would hand failed-fetch docs rank 1
    // here and rank >quota in the oracle — individually consistent,
    // hash-mismatched. The operator pins NULLS LAST; this case plants
    // 25 docs (3 NULL) in one stratum and the 20-slot quota must hold
    // content docs only.
    val d = newTempDir("graft-sfnulltext")
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    (0L until 25L).map(i =>
        (i, if (i % 9 == 0) null else s"doc number $i body", "en",
          "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("sample_stratified")(spark, d).collect()
    assert(out.length == 20, s"quota: ${out.length}")
    val nullIds = Set(0L, 9L, 18L)
    assert(!out.exists(r => nullIds.contains(r.getAs[Long]("doc_id"))),
      "NULL-text docs entered the quota ahead of content docs")
  }

  test("quality_buckets excludes NULL-text docs and keeps deciles exact") {
    // a failed-fetch doc has NULL score; before the explicit filter the
    // engines put it at OPPOSITE ends of the cumulative window (Spark
    // NULLS FIRST vs DuckDB NULLS LAST), shifting every bucket, and the
    // final equi-join silently DROPPED the doc from the Spark output
    // while the oracle kept it — a gate-blind divergence on the one
    // input class this suite treats as routine
    val out = SparkEntry.queries("quality_buckets")(spark, nullDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nonNull = spark.read.parquet(s"$nullDir/documents.parquet")
      .filter(col("text").isNotNull).count()
    assert(out.length == nonNull,
      s"bucketed ${out.length} docs, expected the $nonNull non-NULL ones")
    // with NULLs excluded the decile arithmetic is exact: the highest
    // score must land in bucket 10, and every bucket is in [1, 10]
    assert(out.map(_._3).max == 10L && out.map(_._3).min >= 1L)
    val maxScore = out.map(_._2).max
    assert(out.filter(_._2 == maxScore).forall(_._3 == 10L))
  }

  test("decontaminate with an EMPTY eval set still verdicts every doc") {
    // The r19 cache-independent shape derives the eval n-grams from a
    // 10%-subset scan; a corpus where no eligible doc exists (none
    // reaches the 30-token eval-window threshold) makes that relation
    // EMPTY — the overlap join must degrade to zero matches, never an
    // empty-broadcast error, and the doc_id-only spine must still emit
    // one clean verdict per doc, NULL text included (a failed fetch is
    // routine input; its CASE-guarded n-gram array is empty, exactly
    // as the old filter shape dropped it).
    val d = newTempDir("graft-sfshortdocs")
    import spark.implicits._
    (0L until 30L).map(i =>
        (i, if (i % 7 == 0) null else s"short doc $i", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("decontaminate")(spark, d).collect()
    assert(out.length == 30, s"expected 30 verdicts, got ${out.length}")
    assert(out.forall(r => r.getLong(1) == 0L && !r.getBoolean(2)),
      "an empty eval set must flag nothing")
  }

  test("events dtype probe: the nanos conf follows the session, not the cache") {
    // the probe caches per DIR in a JVM-global map, but the legacy
    // nanosAsLong conf is per SESSION and used to be touched only on a
    // cache MISS — so probing a non-nanos dir could unset it while an
    // earlier nanos dir's frames were still lazy (this very suite mixes
    // fixture dirs in one session), and a cache hit in a fresh session
    // never established it at all. Every call now (re-)asserts the conf
    // for the passed session.
    val conf = "spark.sql.legacy.parquet.nanosAsLong"
    val saved = Tables.tsLongCache.readOnlySnapshot().toMap
    val nanosDir = "/simulated/nanos/fixture"
    try {
      // a cache HIT on a nanos dir must establish the conf for THIS
      // session even though the probe body never runs (the
      // fresh-session-in-a-warm-JVM case)
      Tables.tsLongCache.put(nanosDir, true)
      spark.conf.unset(conf)
      assert(Tables.eventsTsIsLong(spark, nanosDir))
      assert(spark.conf.getOption(conf).contains("true"),
        "cache hit failed to establish the conf for this session")
      // probing a NON-nanos dir must keep the conf set while THIS
      // session's nanos frames may still be lazy
      assert(!Tables.eventsTsIsLong(spark, sf))
      assert(spark.conf.getOption(conf).contains("true"),
        "non-nanos probe unset the conf under this session's nanos use")
      // but a DIFFERENT session in the same JVM that never touched a
      // nanos dir must NOT inherit the conf — the global cache is a
      // file-property cache, not a conf policy (a forced conf would
      // silently map that session's own nanos columns to bare longs)
      val other = spark.newSession()
      assert(!Tables.eventsTsIsLong(other, sf))
      assert(other.conf.get(conf) == "false",
        "unrelated session inherited the nanos conf from the cache")
      // and once this session's nanos resolution is forgotten, a
      // non-nanos call unsets (to the registered default "false" —
      // getOption never returns None for a conf with a default)
      Tables.sessionNanos.remove(spark)
      assert(!Tables.eventsTsIsLong(spark, sf))
      assert(spark.conf.get(conf) == "false",
        "conf left enabled with no nanos fixture to justify it")
    } finally {
      Tables.tsLongCache.clear()
      Tables.tsLongCache ++= saved
      Tables.sessionNanos.remove(spark)
      spark.conf.unset(conf)
    }
  }

  test("centroid expressions stay typed with zero collected centroids") {
    // the specific r11 regression: the Lloyd pass over an empty corpus
    // collects zero centroids, and cellOf/centDists must still render
    // an analyzable, correctly-typed plan (previously an untyped
    // array() → AnalysisException before a single row could flow)
    for (n <- Seq("ann_ivf", "dedup_semantic")) {
      val df = SparkEntry.queries(n)(spark, emptyDir)
      assert(df.schema.fieldNames.nonEmpty, s"$n lost its schema")
      assert(df.count() == 0L, s"$n conjured rows from nothing")
    }
  }
}
