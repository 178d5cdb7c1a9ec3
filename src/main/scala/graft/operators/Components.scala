package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair relation — the step
  * that turns pairwise dedup output (LSH / Jaccard pairs) into actual
  * keep/drop decisions. Near-duplication is not transitive (A≈B and B≈C
  * can hold with A and C below threshold), so a corpus-scale dedup pass
  * must group pairs into components and keep one document per component;
  * emitting pairs alone would under-delete every chain.
  *
  * The implementation is iterative min-label propagation expressed as
  * plain joins/aggregations: every vertex starts as its own label; each
  * round every vertex takes the min of its own and its neighbors' labels;
  * fixpoint when no label changes. Rounds ≈ component diameter — near-dup
  * clusters are shallow (a handful of hops), so this terminates in a few
  * hash-partitioned shuffles on the edge relation with no driver-side
  * state (the driver sees one scalar per round). Each round also
  * POINTER-JUMPS (comp(v) ← comp(comp(v)), one vertex-sized self-join):
  * neighbor propagation alone needs diameter rounds, while jumping
  * squares the reach per round, giving O(log diameter) total — the same
  * guarantee as large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) with simpler rounds.
  * A 64-vertex chain converges in 7 rounds (spec-pinned) vs 63 without.
  */
object Components extends QueryModule {

  /** Min-label propagation to fixpoint.
    *
    * @param vertices one column `v` (numeric id); isolated vertices come
    *                 out as their own singleton component. Edge endpoints
    *                 need NOT be covered — labels are seeded from
    *                 vertices ∪ endpoints (one extra vertex-scale
    *                 distinct at round 0), so the row set is fixed from
    *                 the start
    * @param edges    columns (`src`, `dst`), undirected, self-loops and
    *                 duplicates tolerated
    * @return (v, component) where component = min vertex id reachable,
    *         one row per seeded vertex (including endpoint-only ones)
    *
    * Convergence probe: labels only ever decrease, so the label SUM is
    * strictly decreasing until the fixpoint — one scalar aggregate per
    * round instead of a change-detection join. Fails loudly if `maxIter`
    * rounds don't reach the fixpoint: a silently-unconverged labeling
    * would split components and under-dedup.
    *
    * Each round's result is `localCheckpoint`ed, not merely persisted:
    * the round-N plan references round N−1 twice (self-union + join), so
    * without lineage TRUNCATION the logical plan doubles per round and
    * driver-side re-analysis grows exponentially — profiled at sf0.1 as
    * 0.8 s → 12.4 s by round 5. Truncation makes every round O(1) in
    * plan size; a cluster deployment that needs lineage-based fault
    * recovery swaps in reliable `checkpoint()` against the checkpoint
    * dir, same shape (the standard Pregel/GraphX iteration discipline).
    */
  /** Edge-count cutover for the adaptive driver-side fast path: below
    * this, the edge list is collected and solved with union-find (16 MB
    * of pairs at the default — trivially driver-safe), above it the
    * distributed loop runs. The same runtime-adaptive posture as AQE's
    * broadcast-join flip: near-dup edge relations are usually a small
    * fraction of the corpus (dup pairs, not documents), so most runs
    * take one job instead of ~5 jobs × O(log diameter) rounds; a
    * pathological all-dups corpus still degrades to the scale path, and
    * the VERTEX relation never leaves the cluster either way.
    */
  val defaultDriverEdgeLimit: Long = 1000000L

  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25,
      driverEdgeLimit: Long = defaultDriverEdgeLimit): DataFrame = {
    // ids normalized to BIGINT at entry: the fast path reads endpoints
    // with getLong while the distributed loop would coerce int columns
    // through SQL — without the cast the adaptive cutover changed
    // CORRECTNESS (ClassCastException) for int-typed ids, not just
    // strategy. e is released in the finally: a mid-round job failure
    // used to leak its persisted blocks past the per-query clearCache.
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = vertices.select(col("v").cast("long").as("v"))
    try {
    // e is persisted, so this count doubles as the pipeline breaker the
    // loop's first join needed anyway.
    if (e.count() <= driverEdgeLimit) {
      val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union-by-min keeps every root the MIN of its component, the
        // label the distributed loop converges to
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val comp = parent.keys.toSeq.map(v => (v, find(v)))
      import vertices.sparkSession.implicits._
      val compDf = comp.toDF("v", "component")
      // same row-set contract as the loop (vertices ∪ endpoints), same
      // materialized-result contract (localCheckpoint: callers may
      // unpersist upstream inputs right after)
      return verts
        .union(compDf.select(col("v")))
        .distinct()
        .join(broadcast(compDf), Seq("v"), "left")
        .select(col("v"),
          coalesce(col("component"), col("v")).as("component"))
        .localCheckpoint()
    }
    val sym = e.select(col("src").as("u"), col("dst").as("w"))
      .union(e.select(col("dst").as("u"), col("src").as("w")))
    // Labels are seeded from vertices ∪ edge endpoints: an endpoint
    // missing from `vertices` would otherwise be conjured mid-iteration
    // by the neighbor join, transiently breaking the strictly-decreasing
    // label-sum invariant the convergence probe relies on (the sum can
    // INCREASE when new rows appear). Seeding the union keeps the row
    // set fixed across rounds, so callers may pass a vertex relation
    // that under-covers the edges without corrupting convergence.
    var labels = verts
      .union(e.select(col("src").as("v")))
      .union(e.select(col("dst").as("v")))
      .distinct()
      .select(col("v"), col("v").as("component"))
      .localCheckpoint()

    // DECIMAL(38,0) accumulator: a Long sum overflows around 10⁹ vertices
    // with 10¹⁰-scale ids, i.e. exactly the corpus sizes SCALE.md targets.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)

    var cur = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val rt0 = System.nanoTime()
      val viaNeighbors = sym.join(labels, col("w") === col("v"))
        .select(col("u").as("v"), col("component"))
      val propagated = labels.select(col("v"), col("component"))
        .union(viaNeighbors)
        .groupBy(col("v")).agg(min(col("component")).as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the jump
      // pointer jumping: follow the label's own label. Sound because
      // labels only decrease and stay within the component (every
      // component value is itself a vertex, so the inner join is total).
      val next = try propagated.as("x")
          .join(propagated.as("p"), col("x.component") === col("p.v"))
          .select(col("x.v").as("v"), col("p.component").as("component"))
          .localCheckpoint() // eager: materializes + truncates the plan
        finally propagated.unpersist(blocking = false)
      val nextSum = labelSum(next)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[ccround] $rounds%d ${(System.nanoTime() - rt0) / 1e9}%.2f s")
      // Free the superseded round's checkpoint blocks NOW rather than
      // waiting for driver GC + ContextCleaner: on a long high-diameter
      // run, lingering vertex-sized cached generations would pressure
      // executor storage memory. localCheckpoint blocks live on the
      // materialized RDD inside the LogicalRDD leaf, not in the SQL
      // cache, so Dataset.unpersist does not reach them.
      labels.queryExecution.analyzed.collectLeaves().foreach {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
      labels = next
      converged = nextSum.compareTo(cur) == 0
      cur = nextSum
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds")
    labels
    } finally e.unpersist(blocking = false)
  }

  /** Corpus with chain structure: each document plus a 90%-prefix copy
    * (+1M) and a 75%-prefix copy (+2M). Prefix shingle sets nest, so
    * Jaccard(full, 90%) ≈ .9 and Jaccard(90%, 75%) ≈ .83 clear the 0.8
    * edge threshold while Jaccard(full, 75%) ≈ .75 does not — a genuine
    * A–B–C chain whose full component is only recoverable transitively
    * (at sf0.01, 425 of the 500 doc groups form such a chain; the rest
    * land on rounding or cross-doc near-dups, which only densify edges
    * and never change the component answer).
    */
  private[graft] def ccCorpusTokens(s: SparkSession, d: String): DataFrame = {
    // tokenize ONCE, after a fan-out repartition (regexp at file
    // parallelism is the profiled bottleneck). The token frame is
    // persisted HERE because all three union branches reference it and
    // Spark has no cross-branch CSE — without the persist the regexp
    // would run 3× inside the first materialization. Freed by the
    // per-query clearCache in Bench/Verify (the module convention, see
    // Dedup's header note). The prefix copies are token-array SLICES —
    // identical to the oracle's joined-then-retokenized form because
    // tokens contain no whitespace.
    val toks = Tables.load(s, d, "documents")
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")),
          lit(TextOps.NonWsToken), lit(0)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def prefixCopy(shift: Long, num: Int, den: Int): DataFrame =
      toks.select((col("doc_id") + shift).as("doc_id"),
        slice(col("t"), lit(1),
          greatest(expr(s"(size(t)*$num) div $den"), lit(1))).as("t"))
    toks.unionByName(prefixCopy(1000000L, 9, 10))
      .unionByName(prefixCopy(2000000L, 3, 4))
  }

  /** Shared staging for the component queries: cached corpus tokens,
    * cached capped shingles, and the Jaccard ≥ 0.8 edge relation — the
    * persist/count choreography in ONE place (raw shingles are persisted
    * before the df-cap census reads them twice, then dropped). Callers
    * unpersist `corpus` and `sh` once the component labels are
    * checkpointed.
    */
  private[graft] def stagedCorpusEdges(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val corpus = ccCorpusTokens(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    // re-fan the 3-branch union by doc_id before the shingle explode
    // (r21): each prefix branch inherits the cached toks' 32 partitions,
    // and without one coalescing exchange the persisted shingle relation
    // carries 3×32 tiny partitions into every downstream consumer (the
    // census, the cap anti-join, both self-join sides) — measured as a
    // ~55% task-count inflation once the old distinct's exchange
    // stopped providing the coalesce. Token arrays are 1 row/doc —
    // strictly fewer rows than the exploded shingle exchange the r20
    // shape paid at this spot.
    val raw = Dedup.shinglesFromTokens(corpus.repartition(col("doc_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    raw.count()
    val sh = Dedup.cappedShingles(raw).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count() // pipeline breaker (see dedup_minhash_lsh note)
    raw.unpersist(blocking = false)
    val edges = edgesFromShingles(sh)
    (corpus, sh, edges)
  }

  /** The ONE near-dup edge definition (Jaccard >= 0.8 over capped
    * shingles, projected to src/dst) shared by the staged production
    * path and the spec crosscheck hook — two hand-written copies could
    * silently drift on the threshold or projection and the crosscheck
    * would compare a DIFFERENT edge relation than production.
    */
  private def edgesFromShingles(sh: DataFrame): DataFrame =
    Dedup.countJaccard(sh).filter(col("jac") >= 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))

  /** The dedup_components edge relation over (doc_id, t) token rows
    * (spec crosscheck hook). Mirrors stagedCorpusEdges' persist
    * choreography: cappedShingles scans its input twice (the frame +
    * the df census), so the raw shingle build is persisted for the
    * duration and the capped result checkpointed before release.
    */
  private[graft] def jaccardEdges(corpusToks: DataFrame): DataFrame = {
    // same pre-explode doc_id re-fan as stagedCorpusEdges (the two must
    // stage identically or the crosscheck compares different plans)
    val raw = Dedup.shinglesFromTokens(corpusToks.repartition(col("doc_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      raw.count()
      edgesFromShingles(Dedup.cappedShingles(raw).localCheckpoint())
    } finally raw.unpersist(blocking = false)
  }

  override val queries: Seq[Q] = Seq(

    // Near-dup clusters: word-3-gram Jaccard ≥ 0.8 pairs (same capped
    // inverted-index pipeline as dedup_ngram_jaccard) grouped into
    // components; component id = the keeper (min doc_id reachable).
    Q("dedup_components",
      (s, d) => {
        val (corpus, sh, edges) = stagedCorpusEdges(s, d)
        val verts = corpus.select(col("doc_id").as("v"))
        val out = connectedComponents(verts, edges)
          .select(col("v").as("doc_id"), col("component"))
        sh.unpersist(blocking = false)
        corpus.unpersist(blocking = false)
        out
      },
      // Reachability closure + min label. The recursive CTE enumerates
      // (v, reachable u) pairs — fine at oracle scale where components
      // are tiny; the Spark side never materializes the closure. The
      // df ≤ 256 filter mirrors Dedup.maxShingleDf so the two engines
      // compute Jaccard over the identical shingle vocabulary at ANY df
      // distribution.
      Some(s"""WITH RECURSIVE $ccOracleCtes
               SELECT doc_id, component FROM comp"""))
  )

  /** The dedup_components oracle as reusable CTEs ending in
    * `comp(doc_id, component)` — shared with the pipeline_corpus
    * capstone so the clustering definition lives in one place. Must be
    * prefixed with WITH RECURSIVE by the consumer.
    */
  private[operators] def ccOracleCtes: String =
    """toks0 AS (SELECT doc_id,
                   regexp_extract_all(lower(text), '\S+') AS t
                 FROM documents),
       corpus AS (
         SELECT doc_id, lower(text) AS text FROM documents
         UNION ALL
         SELECT doc_id + 1000000,
                array_to_string(t[1:greatest((len(t)*9)//10,1)], ' ')
         FROM toks0
         UNION ALL
         SELECT doc_id + 2000000,
                array_to_string(t[1:greatest((len(t)*3)//4,1)], ' ')
         FROM toks0),
       toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                FROM corpus),
       sh0 AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t)-1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
               FROM toks WHERE len(t) >= 3),
       sh AS (SELECT sh0.doc_id, sh0.s FROM sh0
              JOIN (SELECT s FROM sh0 GROUP BY s
                    HAVING count(*) <= 256) rare USING (s)),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         count(*) AS c
                  FROM sh a JOIN sh b
                    ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
       edges AS (SELECT doc_a, doc_b FROM common
                 JOIN sizes sa ON doc_a = sa.doc_id
                 JOIN sizes sb ON doc_b = sb.doc_id
                 WHERE c / (sa.n + sb.n - c) >= 0.8),
       sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
               UNION ALL SELECT doc_b, doc_a FROM edges),
       reach AS (SELECT doc_id AS v, doc_id AS u FROM corpus
                 UNION
                 SELECT r.v, e.b FROM reach r JOIN sym e ON r.u = e.a),
       comp AS (SELECT v AS doc_id, min(u) AS component
                FROM reach GROUP BY v)"""
}
