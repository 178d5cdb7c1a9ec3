package graft.operators

import graft.functions.Sketches
import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, SparkSession}

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
        val sketch = li.agg(cm(col("l_returnflag"))).head().getSeq[Long](0).toArray
        // distinct flag values: bounded domain (A/N/R), metadata-scale
        val keys = li.select(col("l_returnflag")).distinct()
          .collect().map(_.getString(0))
        import s.implicits._
        keys.map(k => (k, Sketches.cmEstimate(sketch, k))).toSeq
          .toDF("l_returnflag", "est_count")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS est_count
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Equi-depth histogram bounds — the third ANALYZE artifact
    // (`statistics/histogram.go:79`, 256 buckets default at
    // `executor/analyze.go:62`; 8 here to keep the result readable).
    // Exact `percentile` and DuckDB's quantile_cont share the
    // type-7 / percentile_cont interpolation, so bounds hash-match. The
    // exact aggregate buffers the column per task — fine as the oracle
    // baseline; the 100 TB path is approx_percentile (same plan shape,
    // bounded t-digest state), pinned within tolerance by SketchSpec.
    Q("stats_histogram",
      (s, dir) => {
        val probs = (1 to 8).map(_ / 8.0)
        // ONE percentile aggregate over the probability array (a single
        // per-task buffer of the column), projected into b1..b8
        Tables.load(s, dir, "orders")
          .agg(percentile(col("o_totalprice"),
            array(probs.map(lit): _*)).as("q"))
          .select((1 to 8).map(i =>
            round(element_at(col("q"), i), 4).as(s"b$i")): _*)
      },
      Some((1 to 8).map(i =>
          s"round(quantile_cont(o_totalprice, ${i / 8.0}), 4) AS b$i")
        .mkString("SELECT ", ", ", " FROM orders"))),

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
      Some("""SELECT event_type, count(*) AS est_count FROM events
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
}
