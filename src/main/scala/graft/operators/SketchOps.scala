package graft.operators

import graft.functions.Sketches
import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Statistics sketches as engine operators — the reference's ANALYZE
  * pipeline builds these per column (`executor/analyze.go:44-62`:
  * Count-Min depth 5 × width 2048, FM sketch for NDV) and feeds them to
  * selectivity estimation. Here they double as training-pipeline tools:
  * mergeable frequency / distinct-count state over a 100 TB corpus with
  * sketch-sized shuffles.
  *
  * Scale posture: one partial-aggregate pass per table (map-side
  * combined), buffers are KB-scale regardless of data volume, and only
  * the finished sketch reaches the driver — the same metadata-scale
  * collect as ANALYZE stats or the IVF centroids.
  */
object SketchOps extends QueryModule {

  override val queries: Seq[Q] = Seq(

    // Count-Min point-frequency estimates in the reference's default
    // 5×2048 geometry. Over a low-cardinality key the estimate is exact
    // (a key only overshoots if it collides with another key in ALL 5
    // rows — with 3 flag values in 2048 buckets that never happens), so
    // the oracle is the exact GROUP BY count. High-cardinality behavior
    // (one-sided error, overshoot bound, merge identity) is pinned by
    // SketchSpec.
    Q("stats_cm_freq",
      (s, dir) => {
        val cm = udaf(new Sketches.CountMinAgg(5, 2048), Encoders.STRING)
        val li = Tables.load(s, dir, "lineitem")
        // ONE scan yields both artifacts: the sketch AND the bounded
        // key domain (collect_set — NDV-scale like the sketch itself,
        // and NULL-skipping like CountMinAgg.reduce, so a NULL flag
        // neither NPEs the driver-side cmEstimate nor conjures a key
        // the sketch never counted). The previous separate
        // distinct() job re-scanned the largest table just for 3
        // values — the module's one-pass posture, violated by its
        // own first query.
        val agged = li.agg(cm(col("l_returnflag")).as("sk"),
          collect_set(col("l_returnflag")).as("ks")).head()
        val sketch = agged.getSeq[Long](0).toArray
        val keys = agged.getSeq[String](1)
        import s.implicits._
        keys.map(k => (k, Sketches.cmEstimate(sketch, k)))
          .toDF("l_returnflag", "est_count")
          .orderBy("l_returnflag")
      },
      // IS NOT NULL mirrors the sketch contract (NULL keys take no part
      // in a frequency sketch); without it a NULL-bearing column would
      // add a NULL group row here that the Spark side rightly omits
      Some("""SELECT l_returnflag, count(*) AS est_count
              FROM lineitem WHERE l_returnflag IS NOT NULL
              GROUP BY 1 ORDER BY 1""")),

    // Equi-depth histogram bounds — the third ANALYZE artifact
    // (`statistics/histogram.go:79`, 256 buckets default at
    // `executor/analyze.go:62`; 8 here to keep the result readable).
    //
    // EXACT-DECIMAL interpolation, not percentile doubles: at p = k/8
    // over 2-decimal prices, every type-7 bound is an exact scale-5
    // decimal (fraction m/8 with m ∈ 0..7, times a 2-decimal delta —
    // 1/8 = 0.125), so both engines can compute the identical rational
    // and cast it to the identical nearest double. The previous
    // round(percentile, 4) form hashed GREEN at sf0.01 but RED at
    // sf0.1: b5 there is exactly …0.43875, a round-half boundary where
    // Spark's and DuckDB's independently-interpolated doubles sit an
    // ulp apart — any fixed-precision rounding of engine-divergent
    // floats is fragile; quantized-before-the-fact integer/decimal
    // arithmetic (the ExactNum / text_entropy posture) is not.
    //
    // Scale shape (also strictly better than the old per-task column
    // buffer): ONE distinct-value census (NDV-scale hash agg), then an
    // ADAPTIVE rank lookup (the connectedComponents/BPE cutover
    // discipline): a census under DriverCensusLimit collects once and
    // the rank walk runs in-process; above it, a two-level prefix sum
    // (coarse 4096-currency-unit value bins → metadata-scale
    // bin-offset window → intra-bin window, the pack_sequences
    // pattern — no data-scale single-partition stage) plus a broadcast
    // join against the ≤16 needed ranks, with only those 16 rows
    // reaching the driver. Both paths feed the same exact-decimal
    // interpolation (spec-pinned equivalence incl. the boundary ±1).
    // The 100 TB approximate path stays approx_percentile, pinned
    // within tolerance by SketchSpec.
    Q("stats_histogram",
      (s, dir) => equiDepthBounds(s, Tables.load(s, dir, "orders")
        .select(col("o_totalprice").cast("decimal(18,2)").as("v"))),
      Some("""WITH p AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v
                         FROM orders),
              nn AS (SELECT count(*) AS n FROM p),
              s AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
                    FROM p),
              kk AS (SELECT k, (k * (n - 1)) // 8 AS p0,
                            (k * (n - 1)) % 8 AS m
                     FROM range(1, 9) t(k), nn),
              bd AS (SELECT k,
                       CAST(CAST((s0.v * CAST(8 - m AS DECIMAL(1,0))
                                  + coalesce(s1.v, s0.v)
                                    * CAST(m AS DECIMAL(1,0)))
                                 * CAST(0.125 AS DECIMAL(4,3))
                                 AS DECIMAL(30,5)) AS DOUBLE) AS bound
                     FROM kk JOIN s s0 ON s0.r = p0
                             LEFT JOIN s s1 ON s1.r = p0 + 1)
              SELECT """ + (1 to 8).map(i =>
                s"max(CASE WHEN k = $i THEN bound END) AS b$i")
                .mkString(", ") + " FROM bd")),

    // Misra-Gries heavy hitters (k=64) over the event-type stream: the
    // mergeable top-k companion to Count-Min (MG underestimates, CM
    // overestimates). With true NDV (5) ≤ k no counter ever decrements,
    // so counts are exact and the oracle is the exact GROUP BY top-3;
    // the adaptive regime's n/(k+1) bound is pinned by SketchSpec.
    Q("stats_topk",
      (s, dir) => {
        val mg = udaf(new Sketches.MisraGriesAgg(64), Encoders.STRING)
        val sketch = Tables.loadEvents(s, dir)
          .agg(mg(col("event_type"))).head().getMap[String, Long](0)
        import s.implicits._
        sketch.toSeq
          // UTF-8 byte tie-break to match the oracle's ORDER BY (Java
          // String ordering is UTF-16 — see Utf8Order)
          .sortBy { case (key, c) => (-c, key) }(
            Ordering.Tuple2(Ordering.Long, Utf8Order)).take(3)
          .toDF("event_type", "est_count")
      },
      // IS NOT NULL mirrors MisraGriesAgg.reduce's null skip: unnamed
      // events carry no key for a heavy-hitter sketch, and the oracle's
      // GROUP BY would otherwise rank a NULL group the sketch never saw
      Some("""SELECT event_type, count(*) AS est_count FROM events
              WHERE event_type IS NOT NULL
              GROUP BY 1 ORDER BY est_count DESC, event_type LIMIT 3""")),

    // FM-sketch NDV for two orders columns in one aggregate pass. With
    // maxSize 65536 above the columns' true NDV at test scale the mask
    // never grows and the estimate equals the exact distinct count; the
    // adaptive (mask-growing) regime is spec-tested for tolerance.
    Q("stats_fm_ndv",
      (s, dir) => {
        val fm = udaf(new Sketches.FMSketchAgg(65536), Encoders.STRING)
        Tables.load(s, dir, "orders")
          .agg(
            fm(col("o_custkey").cast("string")).as("ndv_custkey"),
            fm(col("o_orderstatus")).as("ndv_status"))
      },
      Some("""SELECT count(DISTINCT o_custkey) AS ndv_custkey,
                     count(DISTINCT o_orderstatus) AS ndv_status
              FROM orders""")))

  /** Exact 8-bucket equi-depth bounds over a single `decimal(18,2)`
    * column `v` (non-null): one row `(b1..b8)` of doubles, each the
    * type-7 quantile at p = k/8 computed as an EXACT scale-5 decimal
    * and then cast to the nearest double (see the stats_histogram
    * commentary above for why exactness matters and for the shape's
    * scale account). Extracted so SketchSpec can drive synthetic edge
    * frames — empty, single-row, all-equal, negative, bin-boundary —
    * through the EXACT production pipeline.
    *
    * Empty input returns one all-NULL row, matching what an aggregate
    * with no GROUP BY returns over empty input in both engines (the
    * agg_empty_input discipline).
    *
    * Negative values are safe under the `cents div 409600` coarse bin:
    * integer `div` truncates toward zero, so the negative bins are
    * asymmetric (bin 0 spans (-4096, 4096) in currency units) but the
    * bin ranges stay disjoint and monotone in `bkt` — which is all the
    * bin-offset prefix sum needs (spec-pinned).
    *
    * CROSS-ENGINE PRECISION BOUND: the "identical nearest double" claim
    * holds while the bound's scale-5 unscaled value stays under 2^53
    * (|v| ≲ 9·10^10). Above that, DuckDB's DECIMAL→DOUBLE cast
    * double-rounds (INT128→double, then ÷10^5) where Java's
    * BigDecimal.doubleValue rounds once, and the two can land an ulp
    * apart — the exact failure mode this helper exists to remove. Fine
    * for any price-like column; do NOT reuse for magnitudes beyond that
    * without re-deriving the oracle.
    */
  private[graft] def equiDepthBounds(s: SparkSession, pr: DataFrame,
      driverCensusLimit: Long = DriverCensusLimit): DataFrame = {
    import s.implicits._
    // distinct-value census with an EXACT integer coarse bin: cents
    // are integral for a scale-2 decimal, so `cents div 409600`
    // (4096 currency units) can never mis-bin a boundary value the
    // way rounded decimal division could. Persisted: n comes from
    // the same census (one parquet scan, one shuffle — a separate
    // pr.count() job would rescan the file), and the rank pipeline
    // below reuses the materialized NDV-scale relation.
    val vc = pr.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("bkt", expr("CAST(v * 100 AS BIGINT) div 409600"))
      .persist()
    try {
      // ONE aggregate decides n AND the adaptive cutover (and
      // materializes the persist)
      val cut = vc.agg(coalesce(sum(col("c")), lit(0L)).as("n"),
        count(lit(1)).as("ndv")).head()
      val n = cut.getLong(0)
      if (n == 0L) {
        val none: Option[Double] = None
        return Seq((none, none, none, none, none, none, none, none))
          .toDF((1 to 8).map(i => s"b$i"): _*)
      }
      // type-7 target for p = k/8: position k(n-1)/8 = p0 + m/8
      val spec = (1 to 8).map { k =>
        val t = k.toLong * (n - 1); (k, t / 8, (t % 8).toInt)
      }
      val needed = spec.flatMap { case (_, p0, m) =>
        if (m > 0) Seq(p0, p0 + 1) else Seq(p0)
      }.distinct
      // Adaptive cutover (the connectedComponents/BPE discipline): a
      // census under the bound is collected ONCE and the rank walk
      // runs in-process — the distributed path below costs ~6 more
      // stage launches for ranks the driver can read off a sorted
      // array. Same interpolation code on both paths (spec-pinned
      // equivalence, including the boundary ±1).
      val atRank: Map[Long, BigDecimal] =
        if (cut.getLong(1) <= driverCensusLimit) {
          val sorted = vc.select(col("v"), col("c")).collect()
            .map(r => (BigDecimal(r.getDecimal(0)), r.getLong(1)))
            .sortBy(_._1)
          val want = needed.sorted
          val found = Map.newBuilder[Long, BigDecimal]
          var cum = 0L; var i = 0; var w = 0
          while (w < want.length && i < sorted.length) {
            val (v, c) = sorted(i)
            while (w < want.length && want(w) < cum + c) {
              found += want(w) -> v; w += 1
            }
            cum += c; i += 1
          }
          found.result()
        } else distributedAtRank(vc, needed)
      val eighth = BigDecimal("0.125")
      // exact scale-5 decimal → nearest double; DuckDB's
      // CAST(DECIMAL AS DOUBLE) of the same rational lands on the
      // same bits
      val b = spec.map { case (_, p0, m) =>
        val v0 = atRank(p0)
        val v1 = if (m > 0) atRank(p0 + 1) else v0
        ((v0 * (8 - m) + v1 * m) * eighth).toDouble
      }
      Seq((b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7)))
        .toDF((1 to 8).map(i => s"b$i"): _*)
    } finally vc.unpersist(blocking = false)
  }

  /** Driver-side census bound for [[equiDepthBounds]]' adaptive fast
    * path: rows are (decimal, long, long) ≈ tens of bytes, so 1M rows
    * collect in the low tens of MB — trivially driver-safe. A
    * cents-granular price column at 100 TB can exceed it (NDV up to
    * ~6·10⁷ for a bounded price domain), which is what keeps the
    * distributed rank pipeline live.
    */
  private[graft] val DriverCensusLimit = 1000000L

  /** The distributed rank lookup (the over-bound path): bin offsets by
    * a metadata-scale window over BIN aggregates (pack_sequences
    * pattern), an intra-bin prefix window, then a broadcast join
    * against the ≤16 needed ranks. No data-scale single-partition
    * stage, nothing buffers the column.
    */
  private def distributedAtRank(vc: DataFrame,
      needed: Seq[Long]): Map[Long, BigDecimal] = {
    import org.apache.spark.sql.expressions.Window
    val s = vc.sparkSession
    import s.implicits._
    val bktOff = vc.groupBy(col("bkt")).agg(sum(col("c")).as("bc"))
      .withColumn("boff", coalesce(sum(col("bc")).over(
        Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bc")
    // global rank range of each distinct value: [lo, lo + c)
    val ranked = vc.join(broadcast(bktOff), "bkt")
      .withColumn("lo", col("boff") + coalesce(sum(col("c")).over(
        Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    ranked
      .join(broadcast(needed.toDF("r")),
        col("r") >= col("lo") && col("r") < col("lo") + col("c"))
      .select(col("r"), col("v"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
      .toMap
  }
}
