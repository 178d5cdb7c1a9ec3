package graft

import graft.operators.{Components, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components, deterministic sampling, sequence packing, and
  * the analytic-surface queries: invariants the DuckDB oracle can't see
  * (multi-hop convergence, failure modes, bucketing-invariance of the
  * distributed prefix sum) plus crosschecks against naive single-node
  * formulations at test scale.
  */
class PipelineScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  // driverEdgeLimit = 0 forces the distributed loop: these tests pin the
  // LOOP's behavior (round counts, maxIter failure), which the adaptive
  // driver fast path would otherwise short-circuit
  private def cc(vs: Seq[Long], es: Seq[(Long, Long)], maxIter: Int = 25,
      driverEdgeLimit: Long = 0L) =
    Components.connectedComponents(
      vs.toDF("v"), es.toDF("src", "dst"), maxIter, driverEdgeLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents: driver fast path equals the distributed loop") {
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val es = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (7L, 8L))
    val loop = cc(vs, es)
    val fast = cc(vs, es, driverEdgeLimit = Components.defaultDriverEdgeLimit)
    assert(fast == loop)
    // endpoint-only vertices (7, 8) are seeded on both paths
    assert(fast.contains(7L) && fast(8L) == 7L)
  }

  test("connectedComponents: int-typed ids take BOTH paths identically") {
    // ids are normalized to BIGINT at entry: the fast path reads
    // endpoints with getLong, so int-typed columns used to crash it
    // with ClassCastException while the distributed loop coerced them —
    // the adaptive cutover changed correctness, not just strategy
    val vs = Seq(1, 2, 3, 9).toDF("v")
    val es = Seq((2, 1), (2, 3), (7, 8)).toDF("src", "dst")
    def run(limit: Long) = Components.connectedComponents(vs, es,
        driverEdgeLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(Components.defaultDriverEdgeLimit)
    val loop = run(0L)
    assert(fast == loop)
    assert(fast(3L) == 1L && fast(8L) == 7L && fast(9L) == 9L)
  }

  test("connectedComponents: cutover boundary (driverEdgeLimit ±1) is path-invariant") {
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val es = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (7L, 8L))
    val n = es.length.toLong
    // the cutover is `edgeCount <= limit`: limit = n-1 forces the
    // distributed loop, n and n+1 take the driver fast path — all three
    // must produce the identical labeling, so a future off-by-one in
    // the comparison can only change WHICH equivalent path runs, never
    // the result
    val at = Seq(n - 1, n, n + 1).map(l => cc(vs, es, driverEdgeLimit = l))
    assert(at.distinct.size == 1)
    assert(at.head(5L) == 1L && at.head(8L) == 7L)
  }

  test("connectedComponents: chain needs multi-hop propagation") {
    // 1-2-3-4-5 is diameter 4: vertex 5 only learns label 1 transitively
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 9L),
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      9L -> 9L))
  }

  test("connectedComponents: cycles, self-loops, duplicate edges") {
    val got = cc(Seq(1L, 2L, 3L, 7L, 8L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L), (1L, 2L), (7L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents: fails loudly when maxIter is too low") {
    intercept[IllegalStateException] {
      cc(Seq(1L, 2L, 3L, 4L, 5L),
        Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L)), maxIter = 1)
    }
  }

  test("connectedComponents: empty graph converges to empty") {
    assert(cc(Seq.empty[Long], Seq.empty[(Long, Long)]).isEmpty)
  }

  test("connectedComponents: 64-chain converges in O(log n) rounds") {
    // plain neighbor propagation needs 63 rounds on a 64-vertex path;
    // pointer jumping squares reach per round — 8 rounds must suffice
    val vs = (0L to 63L)
    val got = cc(vs, (0L until 63L).map(i => (i, i + 1)), maxIter = 8)
    assert(got == vs.map(_ -> 0L).toMap)
  }

  test("dedup_components equals union-find over the same edge relation") {
    val corpus = Components.ccCorpusTokens(spark, sf)
    val edges = Components.jaccardEdges(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val verts = corpus.select("doc_id").as[Long].collect()
    // driver-side union-find ground truth (fine at 150 vertices)
    val parent =
      scala.collection.mutable.Map(verts.toIndexedSeq.map(v => v -> v): _*)
    def find(v: Long): Long =
      if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = verts.map(v => v -> find(v)).toMap
    val got = q("dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // the corpus genuinely exercises transitivity: some component holds
    // the full doc and the 75% copy with no direct edge between them
    val edgeSet = edges.toSet
    assert(want.exists { case (v, c) =>
      v >= 2000000L && c < 1000000L && !edgeSet.contains((c, v)) })
  }

  test("sample_hash is a deterministic content-derived subset") {
    val docs = Tables.load(spark, sf, "documents")
    val a = q("sample_hash").collect().map(_.getLong(0)).sorted
    val b = q("sample_hash").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < docs.count())
  }

  test("sample_weighted keeps every full-rate row and rates order correctly") {
    val docs = Tables.load(spark, sf, "documents")
    val kept = q("sample_weighted").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 sources keep everything
    (0 to 4).map(i => s"src$i").foreach(s =>
      assert(kept.get(s).map(_.toLong) == totals.get(s), s"source $s"))
    // deterministic: identical on re-run
    val rerun = q("sample_weighted").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(rerun == kept)
    // down-weighted tiers keep strict subsets (aggregate, not per-source:
    // 25-doc sources are noisy at the individual level)
    val mid = (5 to 9).map(i => kept.getOrElse(s"src$i", 0)).sum
    val midTotal = (5 to 9).map(i => totals(s"src$i")).sum
    assert(mid > 0 && mid < midTotal, s"mid tier kept $mid of $midTotal")
  }

  test("sample_stratified: exact quota per stratum, dense ranks") {
    val rows = q("sample_stratified").collect()
      .map(r => (r.getString(0), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val ranks = rs.map(_._2).sorted
      assert(ranks.sameElements(1 to ranks.length), s"lang $lang")
      assert(ranks.length <= 20)
    }
  }

  test("shuffle_shard: total partition, contiguous positions, hash order") {
    val rows = q("shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val docs = Tables.load(spark, sf, "documents")
    // a total partition of the corpus: every document exactly once
    assert(rows.length == docs.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    // 8 shards, every one populated at this scale, positions contiguous
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0 to 7).toSet, byShard.keySet.toString)
    byShard.foreach { case (sh, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length), s"shard $sh")
    }
    // deterministic: identical on re-run (the audit property)
    val rerun = q("shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rerun.sorted.sameElements(rows.sorted))
    // shard ↔ hash-range agreement: a doc's shard is its md5 first hex
    // digit div 2 (spec-level re-derivation, not the impl expression)
    val md5First = docs.select(col("doc_id"),
        substring(md5(col("text")), 1, 1).as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, sh, _) =>
      assert("0123456789abcdef".indexOf(md5First(id)) / 2 == sh, s"doc $id")
    }
  }

  test("mix_budget: one plan row per source, exact recipe arithmetic") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = q("mix_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.length == docs.select("source").distinct().count())
    rows.foreach { case (src, nDocs, nToks, wpm, target, rate, epochs) =>
      // tier mapping and integer target arithmetic re-derived spec-side
      val tier = if ((0 to 4).map("src" + _).contains(src)) 100L
        else if ((5 to 9).map("src" + _).contains(src)) 60L else 20L
      assert(wpm == tier, src)
      assert(target == 1000000L * wpm / 1000L, src)
      assert(nDocs > 0 && nToks > 0, src)
      // rate caps at 1; epochs is the uncapped ratio (the up-sampling
      // signal); both re-derived to 4 decimals
      val ratio = target.toDouble / nToks
      assert(rate <= 1.0 && rate >= 0.0, src)
      assert(math.abs(rate -
        math.round(math.min(1.0, ratio) * 10000) / 10000.0) < 1e-9, src)
      assert(math.abs(epochs -
        math.round(ratio * 10000) / 10000.0) < 1e-9, src)
    }
  }

  test("salted stratified quota equals the direct windowed quota") {
    val df = Tables.load(spark, sf, "documents")
      .select(col("lang").as("stratum"),
        concat(md5(col("text")), col("doc_id").cast("string")).as("key"),
        col("doc_id"))
    assert(df.select("stratum", "key").distinct().count() == df.count())
    val direct = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("key"))))
      .filter(col("rk") <= 7)
    val salted = Sampling.stratifiedQuotaSalted(df, 7, 8)
    assert(direct.exceptAll(salted).isEmpty)
    assert(salted.exceptAll(direct).isEmpty)
    // the salt genuinely spreads the hot stratum
    assert(df.select(pmod(xxhash64(col("key")), lit(8))).distinct()
      .count() > 4)
  }

  test("packSequences two-level prefix sum == naive global window") {
    // 40 docs spread over many 16-wide buckets, with gaps and a zero
    val tc = (0 until 40)
      .map(i => (i * 13L, if (i == 7) 0L else (i * 37 % 1000) + 1L))
      .toDF("doc_id", "n_tokens")
    val got = Sampling.packSequences(tc, ctx = 512, bucket = 16)
    val naive = tc.filter(col("n_tokens") > 0)
      .withColumn("off", coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("off div 512").as("first_chunk"),
        expr("(off + n_tokens - 1) div 512").as("last_chunk"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // multi-bucket actually exercised
    assert(tc.select(expr("doc_id div 16")).distinct().count() > 5)
  }

  test("pack_sequences chunks tile the corpus contiguously") {
    val rows = q("pack_sequences").orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    var prevLast = 0L
    rows.foreach { r =>
      val (first, last) = (r.getLong(2), r.getLong(3))
      assert(first <= last)
      assert(first == prevLast || first == prevLast + 1,
        s"gap before doc ${r.getLong(0)}")
      prevLast = last
    }
  }

  test("set_ops: intersect and except partition the high-value set") {
    val rows = q("set_ops").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val inter = rows.filter(_._2 == "intersect").map(_._1).toSet
    val exc = rows.filter(_._2 == "except").map(_._1).toSet
    assert((inter & exc).isEmpty)
    val hi = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000)
      .select("o_custkey").distinct().as[Long].collect().toSet
    assert((inter ++ exc) == hi)
  }

  test("events_rollup: per-type rows sum to the grand total") {
    val rows = q("events_rollup").collect()
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    val typeRows = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    assert(typeRows.map(_.getLong(4)).sum == grand.head.getLong(4))
    val dayRows = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(dayRows.map(_.getLong(4)).sum == grand.head.getLong(4))
  }

  test("pipeline_corpus: keepers are originals, quotas hold, chunks tile") {
    val rows = q("pipeline_corpus").collect()
    assert(rows.nonEmpty)
    // keepers are original docs (component min is the untruncated doc)
    assert(rows.forall(_.getLong(0) < 1000000L))
    // stratified quota respected
    rows.groupBy(_.getString(4)).foreach { case (lang, rs) =>
      assert(rs.length <= 50, s"lang $lang over quota") }
    // packing tiles contiguously in doc_id order
    val sorted = rows.sortBy(_.getLong(0))
    var prevLast = 0L
    sorted.foreach { r =>
      assert(r.getLong(2) == prevLast || r.getLong(2) == prevLast + 1)
      prevLast = r.getLong(3)
    }
  }

  test("events_funnel: stage timestamps ordered, windows respected") {
    val rows = q("events_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stages = r.getLong(4)
      assert(stages >= 1 && stages <= 3)
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) > r.getLong(1)) // click after view
        assert(r.getLong(2) <= r.getLong(1) + 86400L * 1000000L)
      } else assert(stages == 1)
      if (!r.isNullAt(3)) {
        assert(stages == 3)
        assert(r.getLong(3) > r.getLong(2))
        assert(r.getLong(3) <= r.getLong(2) + 2 * 86400L * 1000000L)
      }
    }
  }

  test("emb_quantize: q8 values bounded, extremes hit ±127") {
    val qs = q("emb_quantize").collect().map(_.getString(2))
    assert(qs.nonEmpty)
    val vals = qs.flatMap(_.split(",")).map(_.toLong)
    assert(vals.forall(v => v >= -127 && v <= 127))
    assert(qs.forall(s => s.split(",").map(_.toLong.abs).max == 127))
  }

  test("join_range_bucketed: ordered-pair symmetry and a collect-side replay") {
    val out = SparkEntry.queries("join_range_bucketed")(spark, sf).cache()
    val ev = Tables.loadEvents(spark, sf)
    assert(out.count() == ev.count())
    // every unordered qualifying pair is counted once in each direction
    val total = out.agg(sum(col("n_nearby"))).collect()(0).getLong(0)
    assert(total > 0 && total % 2 == 0)
    // replay the heaviest event's census collect-side
    val top = out.orderBy(col("n_nearby").desc, col("event_id"))
      .limit(1).collect()(0)
    val rows = ev.select(col("event_id"), col("user_id"),
      expr("unix_micros(ts) div 1000000").as("sec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val me = rows.find(_._1 == top.getLong(0)).get
    val expect = rows.count(o =>
      o._2 != me._2 && math.abs(o._3 - me._3) <= 30)
    assert(expect.toLong == top.getAs[Long]("n_nearby"))
    out.unpersist()
  }
}
