package graft

import graft.functions.Sketches
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Statistics-sketch invariants (`statistics/cmsketch.go`,
  * `fmsketch.go`): the oracled queries pin the exact regimes; these pin
  * the approximate regimes and the merge algebra the partial→final
  * dataflow relies on.
  */
class SketchSpec extends SparkSuite {

  private val li = Tables.load(spark, sf, "lineitem")

  test("CM estimate is one-sided and bounded on a high-cardinality key") {
    val cm = udaf(new Sketches.CountMinAgg(5, 2048), Encoders.STRING)
    val keyed = li.select(col("l_orderkey").cast("string").as("k"))
    val sketch = keyed.agg(cm(col("k"))).head().getSeq[Long](0).toArray
    val n = keyed.count()
    assert(Sketches.cmTotal(sketch) == n)
    val exact = keyed.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every key: est >= true (counters only ever overshoot), and the
    // overshoot stays within a generous multiple of the CM bound e*N/w
    val bound = 4.0 * n / 2048
    exact.foreach { case (k, c) =>
      val est = Sketches.cmEstimate(sketch, k)
      assert(est >= c, s"CM undercounted $k: $est < $c")
      assert(est - c <= bound, s"CM overshoot on $k: $est vs $c (bound $bound)")
    }
    // a key never inserted still gets a bounded estimate
    assert(Sketches.cmEstimate(sketch, "no-such-key") <= bound)
  }

  test("CM sketch is partitioning-invariant (merge identity)") {
    val cm = udaf(new Sketches.CountMinAgg(5, 256), Encoders.STRING)
    val keyed = li.select(col("l_suppkey").cast("string").as("k"))
    val a = keyed.repartition(3).agg(cm(col("k"))).head().getSeq[Long](0)
    val b = keyed.repartition(11).agg(cm(col("k"))).head().getSeq[Long](0)
    assert(a == b)
  }

  test("FM NDV is exact below maxSize and tolerant above") {
    val keyed = li.select(col("l_orderkey").cast("string").as("k"))
    val exact = keyed.distinct().count()
    val big = udaf(new Sketches.FMSketchAgg(1000000), Encoders.STRING)
    assert(keyed.agg(big(col("k"))).head().getLong(0) == exact)
    // adaptive regime: mask grows, estimate stays within 2x either way
    val small = udaf(new Sketches.FMSketchAgg(64), Encoders.STRING)
    val est = keyed.agg(small(col("k"))).head().getLong(0)
    assert(est >= exact / 2 && est <= exact * 2,
      s"FM estimate $est outside [${exact / 2}, ${exact * 2}]")
  }

  /** Independent type-7 reference: sort, split k(n-1)/8 into p0 + m/8,
    * interpolate in exact BigDecimal, round once to double — the single
    * definition both histogram tests pin the production pipeline to.
    */
  private def naiveBounds(values: Seq[BigDecimal]): Seq[Double] = {
    val sorted = values.sorted
    val eighth = BigDecimal("0.125")
    (1 to 8).map { k =>
      val t = k.toLong * (sorted.length - 1)
      val p0 = (t / 8).toInt; val m = (t % 8).toInt
      val v0 = sorted(p0)
      val v1 = if (m > 0) sorted(p0 + 1) else v0
      ((v0 * (8 - m) + v1 * m) * eighth).toDouble
    }
  }

  test("stats_histogram equals a naive exact interpolation bit-for-bit") {
    // the production query computes ranks with a two-level prefix sum
    // and interpolates in exact decimal; this replays the same type-7
    // definition naively (collect, sort, BigDecimal) and demands
    // IDENTICAL doubles — pinning the census/bin/offset/rank machinery
    // end to end, including the r10 fix for the round-half fragility
    // (sf0.1's b5 lands on an exact …43875)
    val got = SparkEntry.queries("stats_histogram")(spark, sf).head()
    val want = naiveBounds(Tables.load(spark, sf, "orders")
      .select(col("o_totalprice").cast("decimal(18,2)"))
      .collect().toSeq.map(r => BigDecimal(r.getDecimal(0))))
    (1 to 8).foreach { k =>
      assert(got.getDouble(k - 1) == want(k - 1),
        s"b$k: ${got.getDouble(k - 1)} != naive ${want(k - 1)}")
    }
  }

  test("equiDepthBounds edge frames: empty, single, all-equal, negative, bin-boundary") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def run(vals: Seq[String], limit: Long) =
      graft.operators.SketchOps.equiDepthBounds(spark,
        vals.toDF("s").select(col("s").cast("decimal(18,2)").as("v")),
        driverCensusLimit = limit).head()
    def check(vals: Seq[String], label: String): Unit = {
      val want = naiveBounds(vals.map(BigDecimal(_)))
      // BOTH adaptive paths against the same reference: limit=0 forces
      // the distributed rank pipeline, MaxValue the driver fast path
      Seq(0L -> "dist", Long.MaxValue -> "fast").foreach { case (lim, p) =>
        val got = run(vals, lim)
        (0 until 8).foreach(i => assert(got.getDouble(i) == want(i),
          s"$label/$p b${i + 1}: ${got.getDouble(i)} != ${want(i)}"))
      }
    }
    // empty input → one all-NULL row (both engines' no-GROUP-BY form)
    val empty = run(Nil, Long.MaxValue)
    assert((0 until 8).forall(empty.isNullAt), s"empty: $empty")
    check(Seq("42.17"), "single")                    // n=1: every bound = v
    check(Seq.fill(5)("7.00"), "all-equal")
    // values ON and AROUND the 4096.00 coarse-bin boundary, plus
    // negatives (div truncates toward zero: asymmetric but monotone
    // bins) and a duplicate straddling a rank cut
    check(Seq("-8192.00", "-4096.00", "-4095.99", "-0.01", "0.00",
      "0.01", "4095.99", "4096.00", "4096.01", "8192.00", "8192.00"),
      "boundary")
    // ulp-hazard shape from sf0.1: an exact …875 tie at 4 decimals
    check(Seq("312494.43", "312494.44", "312494.45"), "tie-prone")
    // cutover boundary ±1 (the PipelineScaleOpsSpec discipline): a
    // census of NDV=3 must give identical bits whether the limit sits
    // below, at, or above it — a future off-by-one in the cutover
    // can't silently switch paths mid-gate
    val vals = Seq("1.00", "2.00", "2.00", "3.00")
    val want = naiveBounds(vals.map(BigDecimal(_)))
    Seq(2L, 3L, 4L).foreach { lim =>
      val got = run(vals, lim)
      (0 until 8).foreach(i => assert(got.getDouble(i) == want(i),
        s"limit=$lim b${i + 1}: ${got.getDouble(i)} != ${want(i)}"))
    }
  }

  test("approx_percentile tracks the exact histogram bounds") {
    // the oracled stats_histogram interpolates exact decimals at known
    // ranks; this pins the bounded-state scale path
    // (approx_percentile) against the same type-7 definition via
    // Spark's exact percentile
    val o = Tables.load(spark, sf, "orders")
    val probs = (1 to 8).map(_ / 8.0)
    val exact = o.agg(percentile(col("o_totalprice"),
      array(probs.map(lit): _*)).as("q")).head().getSeq[Double](0)
    val approx = o.agg(percentile_approx(col("o_totalprice"),
      array(probs.map(lit): _*), lit(10000)).as("q")).head().getSeq[Double](0)
    val spread = exact.last - exact.head
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 0.02 * spread,
        s"approx bound $a too far from exact $e")
    }
  }

  test("MG counts are exact below k and partitioning-invariant there") {
    val ev = Tables.loadEvents(spark, sf).select(col("event_type").as("k"))
    val exact = ev.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = udaf(new Sketches.MisraGriesAgg(64), Encoders.STRING)
    val a = ev.repartition(3).agg(mg(col("k"))).head().getMap[String, Long](0)
    val b = ev.repartition(11).agg(mg(col("k"))).head().getMap[String, Long](0)
    assert(a.toMap == exact, s"MG not exact below k: $a vs $exact")
    assert(a.toMap == b.toMap)
  }

  test("MG is one-sided with the n/(k+1) bound on a high-cardinality key") {
    val k = 8
    val keyed = li.select(col("l_suppkey").cast("string").as("k"))
    val n = keyed.count()
    val exact = keyed.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = udaf(new Sketches.MisraGriesAgg(k), Encoders.STRING)
    val est = keyed.agg(mg(col("k"))).head().getMap[String, Long](0).toMap
    assert(est.size <= k)
    val budget = n / (k + 1)
    est.foreach { case (key, c) =>
      val t = exact.getOrElse(key, 0L)
      assert(c <= t, s"MG overcounted $key: $c > $t")
      assert(t - c <= budget, s"MG undershoot on $key: $c vs $t (> $budget)")
    }
    // completeness: every key heavier than the error budget is reported
    exact.filter(_._2 > budget).keys.foreach(key =>
      assert(est.contains(key), s"heavy key $key missing from MG"))
  }

  test("FM sketch is partitioning-invariant") {
    val keyed = li.select(col("l_orderkey").cast("string").as("k"))
    val fm = udaf(new Sketches.FMSketchAgg(64), Encoders.STRING)
    val a = keyed.repartition(3).agg(fm(col("k"))).head().getLong(0)
    val b = keyed.repartition(11).agg(fm(col("k"))).head().getLong(0)
    assert(a == b)
  }
}
