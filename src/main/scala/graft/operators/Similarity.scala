package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types
import org.apache.spark.storage.StorageLevel

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Vector math is pure codegen'd higher-order functions (zip_with +
  * aggregate fold) — no UDF in the hot path. Floats are widened to double
  * before any arithmetic so results are bit-identical to the DuckDB oracle.
  *
  * Two paths, as a 100 TB engine needs both:
  *  - brute-force exact top-k: fine when ONE query vector scans the corpus
  *    (a single distributed pass);
  *  - sign-LSH bucketed search: random-hyperplane buckets bound the
  *    candidate set when there are MANY query vectors (the all-pairs case),
  *    trading recall for a candidates-per-bucket join instead of a cross
  *    product.
  */
object Similarity extends QueryModule {

  /** float[] → double[] (deterministic widening). */
  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Embedding dimensionality (TESTDATA: 64-dim float vectors). */
  private val Dim = 64

  /** In-order left-fold dot product via the native codegen'd
    * [[graft.functions.DotProduct]] expression (see its scaladoc for why
    * neither HOF folds nor term unrolling survive at this width). Fold
    * order matches DuckDB's list_dot_product evaluation, so doubles stay
    * bit-identical for the oracle hash-compare; mismatched dimensions
    * error rather than silently truncate, NULL vectors stay NULL.
    */
  private[operators] def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  /** Cosine with a zero-norm guard: an ALL-ZERO embedding (padding /
    * failed-encode rows — the same class emb_quantize guards) makes the
    * denominator 0, which under the session's ANSI mode THREW
    * DIVIDE_BY_ZERO and killed the whole query, while DuckDB's double
    * division yields NULL and completes (verified on 1.0.0). nullif
    * reproduces DuckDB's exact semantics: NULL sim, which every
    * downstream threshold filters and every rank window sorts last on
    * BOTH engines (Spark desc = desc_nulls_last; DuckDB defaults NULLS
    * LAST in either direction — probed).
    */
  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(dot(a, a)) * sqrt(dot(b, b)), lit(0.0))

  /** The ONE DuckDB cosine fragment every oracle here shares: the same
    * in-order list_dot_product fold as [[cosine]]'s graft_dot, with
    * DuckDB's native div-by-zero→NULL matching the nullif guard above.
    * Single-sourced (the lloydStage discipline) so the bit-exactness
    * convention cannot drift copy by copy.
    */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Embeddings with the widened vector column. The [[Dim]] guard runs
    * ONCE here at the scan (size() is a header read): a regenerated or
    * truncated embedding column must fail loudly, not produce
    * valid-looking shorter cosines downstream. NULL vectors stay NULL
    * (graft_dot then propagates the NULL).
    */
  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorOps.register(s)
    val e = col("embedding")
    // v is produced through explode(array(...)) — row-preserving
    // (explode of a one-element array emits exactly one row, a NULL
    // element included), NOT a plain alias: every consumer that drops
    // NULL vectors (`.where(v.isNotNull)`, or a join inferring it)
    // otherwise gets the predicate alias-substituted into the scan as
    // `isnotnull(CASE ... transform(embedding, ...))`, re-running the
    // 64-element widening per row in the filter stage before the
    // projection runs it again (probe-found r20 — the
    // pushdown-substitution class via the nullable vector alias, the
    // embedding twin of the quality_buckets inferred-isnotnull case;
    // NULL-ness here is semantic, so the non-nullable-coalesce guard
    // does not apply). The Generate node blocks substitution of
    // v-predicates only — vec_id/label predicates and column pruning
    // still reach the scan.
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"),
        explode(array(
          when(e.isNull, lit(null).cast("array<double>"))
            .when(size(e) === Dim, asDouble(e))
            .otherwise(raise_error(format_string(
              s"graft.Similarity: expected $Dim-dim embedding, got %d",
              size(e)))))).as("v"),
        col("label"))
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH.
    * PREFIX-STABLE: one seeded Random filled row-major, so
    * `planes(a, d)` == `planes(b, d).take(a)` for a ≤ b — the property
    * that lets the oracle embed [[MaxLshBits]] plane literals and gate
    * each bit on the runtime-adaptive count (SimilaritySpec pins it).
    */
  private[graft] def planes(nBits: Int, dim: Int,
      seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Runtime-adaptive sign-LSH bit count (the Components/BPE cutover
    * discipline applied to bucket geometry): the smallest bit count
    * whose 2^bits buckets hold ≤ [[LshTargetBucket]] rows on average,
    * clamped to [[MinLshBits]]..[[MaxLshBits]]. Fixed bits cannot
    * survive a corpus-size change — 6 bits over a billion vectors is
    * ~16M rows per bucket (the self-join quadratics the bucketing
    * exists to prevent), while 24 bits over 500 vectors is all
    * singletons (zero recall). Pure integer arithmetic (no log2
    * doubles) so the SQL twin computes the identical count at every
    * boundary.
    */
  private[graft] val LshTargetBucket = 32L
  private[graft] val MinLshBits = 6
  private[graft] val MaxLshBits = 24
  private[graft] def lshBits(n: Long): Int =
    (MinLshBits to MaxLshBits)
      .find(b => (1L << b) * LshTargetBucket >= n).getOrElse(MaxLshBits)

  /** SQL twin of [[lshBits]] over the embeddings count, as a 1-row CTE
    * body (column `nb`) — same integer comparison, same clamp.
    */
  private def lshBitsSql(countFrom: String): String =
    s"""SELECT coalesce((SELECT min(b) FROM range($MinLshBits, ${MaxLshBits + 1}) t(b)
           WHERE (CAST(1 AS BIGINT) << b) * $LshTargetBucket >=
                 (SELECT count(*) FROM $countFrom)), $MaxLshBits) AS nb"""

  /** SQL bucket expression over vector column `v` with the adaptive bit
    * count read from CTE column `nb`: all [[MaxLshBits]] plane literals
    * are embedded (planes() is prefix-stable), bit b contributes only
    * when b < nb.
    */
  private def adaptiveBucketSql: String =
    planes(MaxLshBits, Dim).zipWithIndex.map { case (p, b) =>
      val lit = p.mkString("[", ", ", "]")
      s"CASE WHEN $b < nb AND list_dot_product(v, $lit) > 0 " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Dense-bucket refinement cap (the embedding analog of
    * [[Dedup.maxShingleDf]]'s stop-shingle guard).
    */
  val maxBucketSize = 1024L

  /** Bucket id = sign bits of v against each hyperplane. */
  private[operators] def signBucket(v: Column, pl: Array[Array[Double]]): Column =
    pl.zipWithIndex.map { case (p, b) =>
      when(dotLit(v, p.toSeq) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Dot product against a LITERAL vector — same native expression, with
    * the constant side as an array literal (one plan node, not 64).
    */
  private def dotLit(v: Column, c: Seq[Double]): Column =
    graft.functions.VectorOps.dot(v, typedLit(c))

  /** Squared-distance (d, cell-id) struct list to each centroid
    * (monotone in L2: |v|² - 2·v·c + |c|²; |v|² constant per row so
    * dropped), ordered so `array_min`/`array_sort` pick the nearest
    * cell, ties to the lower id. Cell ids are the SEED
    * vec_ids, not dense positions over the collected seeds: the SQL
    * twins number cells `vec_id AS cell` (c0 in [[semanticOracle]] /
    * [[ivfOracle]]), and a NULL embedding among the seed rows used to
    * shift every dense index after the gap — identical clustering, but
    * dedup_semantic exposes the cell column verbatim, so the
    * hash-compare forked on partial-NULL seed windows. With vec_id
    * ids the two numberings agree under ANY seed NULL pattern (and the
    * argmin tie-break — array_min's (d, i) struct order vs the
    * oracle's (d, cell) — stays aligned too).
    */
  private def centDists(v: Column, cents: Array[(Int, Seq[Double])]): Column =
    if (cents.isEmpty)
      // An EMPTY corpus collects zero centroids (a filtered source
      // being empty is routine at scale). An untyped `array()` literal
      // is VOID-typed and fails ANALYSIS — killing the query at plan
      // time even though no row would ever flow. A typed NULL keeps
      // the plan analyzable; the empty relation never evaluates it.
      lit(null).cast(types.ArrayType(types.StructType(Seq(
        types.StructField("d", types.DoubleType),
        types.StructField("i", types.IntegerType)))))
    else array(cents.toIndexedSeq.map {
      case (id: Int, c: Seq[Double]) =>
        // |c|² as graft_dot(c, c) over the ARRAY literal, not a
        // precomputed lit(double) (r21): a primitive double literal is
        // INLINED into the generated source, so every Lloyd iteration's
        // new centroid values produced brand-new codegen source — a
        // full Janino compile per iteration charged to ann_ivf /
        // dedup_semantic every run. Array literals land in the codegen
        // references array instead, so all iterations (and the final
        // assignment) share ONE compiled class. Identical doubles:
        // graft_dot's in-order fold over (c, c) is exactly the
        // Σ xᵢ·xᵢ left-fold the Scala-side sum computed (and the same
        // fold the oracle's list_dot_product(cv, cv) replays).
        // named_struct: field names survive array_sort/slice, plain
        // struct aliases do not
        named_struct(lit("d"),
          dotLit(typedLit(c), c) - lit(2.0) * dotLit(v, c),
          lit("i"), lit(id))
    }: _*)

  /** Nearest-centroid cell id (a seed vec_id — see [[centDists]]). */
  private def cellOf(v: Column, cents: Array[(Int, Seq[Double])]): Column =
    array_min(centDists(v, cents)).getField("i")

  /** Bands × bits of the dense-bucket refinement (see
    * [[skewSafeBuckets]]): 8 independently-seeded 8-bit plane sets.
    * Collision probability per bit for a cosine-θ pair is 1 − θ/π
    * (random-hyperplane LSH), so a pair in a refined bucket survives
    * ANY-band collision with 1 − (1 − p⁸)⁸ ≈ 0.93 at cosine 0.9,
    * 0.99 at 0.95, and exactly 1 for identical vectors (every band is
    * a deterministic function of v). Eight narrow bands beat one wide
    * set: a single 16-bit refinement keeps only p¹⁶ ≈ 8% of true
    * cosine-0.9 pairs.
    */
  private val RefineBands = 8
  private val RefineBits = 8

  /** Skew-safe sign-LSH bucketing for self-join candidate generation,
    * as (vec_id, band, bucket) rows to be equi-joined on (band, bucket)
    * and pair-DISTINCTed. Level-1 sign buckets under `cap` rows pass
    * through once (band −1); a DENSE bucket is replaced by
    * [[RefineBands]] banded sub-bucketings so it can't drive the
    * downstream self-join quadratic at corpus scale, at the banded
    * recall above (the minhash-LSH tradeoff, not a silent drop — a
    * plain second-level split would lose ~92% of true near-dup pairs).
    * Refined bucket ids live in b1 + (sub+1)·2^bits, disjoint from
    * unrefined ids; bands only join within themselves.
    *
    * Cost at scale: the level-1 frame is persisted (session-lifetime,
    * module convention — see Dedup's header note) and read three times
    * (census, under-cap pass-through, dense explode); the census output
    * (the HOT set, `__n > cap` survivors) is bounded by
    * min(2^bits, corpus/cap) rows — under runtime-adaptive bits the
    * corpus/cap term is the binding one (2^bits alone would read as
    * 16.7M at the 24-bit clamp) — and AQE broadcasts it.
    *
    * @param corpus (vec_id, v) rows
    * @param bits   level-1 plane count — the production caller passes
    *               the runtime-adaptive [[lshBits]] of the corpus
    *               count; no default, so a new call site must choose
    *               (specs inject a tiny value to plant a dense bucket)
    */
  private[graft] def skewSafeBuckets(corpus: DataFrame, bits: Int,
      cap: Long = maxBucketSize): DataFrame = {
    val b1 = corpus.withColumn("b1", signBucket(col("v"), planes(bits, Dim)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Eager breakers (r19, r18 verdict item 2 sweep): b1 feeds THREE
    // branches (census, under-cap pass-through, dense explode) and hot
    // feeds TWO (the anti-join and the refine join) inside the caller's
    // one materializing action — unbreakered, concurrent branch tasks
    // race each cache fill and recompute the signBucket stage per
    // branch, the same scheduling-dependent duplication the module's
    // breaker convention exists to prevent (Dedup.scala header note).
    // b1.count() is one pass over the (caller-cached) corpus;
    // hot.count() is a census over the materialized b1 cache.
    b1.count()
    // persisted: the census feeds BOTH branches below (no cross-branch
    // CSE — see Dedup's header note) and is tiny (≤ corpus/cap rows —
    // each survivor represents > cap corpus rows)
    val hot = b1.groupBy(col("b1")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap).select(col("b1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    hot.count()
    val flat = b1.join(hot, Seq("b1"), "left_anti")
      .select(col("vec_id"), lit(-1).as("band"), col("b1").as("bucket"))
    val bandCols = (0 until RefineBands).map(k => struct(
      lit(k).as("band"),
      (col("b1") + (signBucket(col("v"), planes(RefineBits, Dim, 43L + k))
        + lit(1L)) * lit(1L << bits)).as("bucket")))
    val refined = b1.join(hot, "b1")
      .select(col("vec_id"), explode(array(bandCols: _*)).as("e"))
      .select(col("vec_id"), col("e.band").as("band"),
        col("e.bucket").as("bucket"))
    // hot stays persisted until the session's clearCache: the union is
    // lazy, so unpersisting here would drop the census cache before any
    // caller materializes it (and it is ≤ 2^bits tiny rows)
    flat.unionByName(refined)
  }

  /** Deterministic IVF coarse quantizer: seeds = the first k vectors,
    * refined with `iters` Lloyd iterations. Assignment is a broadcast
    * argmin over k centroids; only k×dim centroid doubles (plus the
    * per-dimension means, k×dim rows) ever reach the driver —
    * metadata-scale, like the reference's ANALYZE stats, not data-scale.
    */
  private[operators] def ivfCentroids(e: DataFrame, k: Int,
      iters: Int, dim: Int = 64): Array[(Int, Seq[Double])] = {
    // NULL vectors (padding / failed-encode rows) take no part in the
    // quantizer: a NULL seed would put a null Seq into the centroid
    // literals (MatchError in centDists) and a NULL row contributes
    // nothing to any mean. Callers exclude them from assignment too.
    // Each centroid keeps its seed vec_id as the CELL ID (the oracles'
    // numbering — see centDists).
    val nn = e.where(col("v").isNotNull)
    var cents: Array[(Int, Seq[Double])] = nn.filter(col("vec_id") < k)
      .orderBy("vec_id").select("vec_id", "v").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1)))
    // Zero seeds with a NON-empty corpus (every vec_id < k row carries a
    // NULL embedding — routine after a failed encode batch) must skip
    // the Lloyd loop entirely: with no centroids cellOf yields a NULL
    // cell for every row, and the refinement collect's getInt(0) on the
    // NULL-cell group would NPE. Callers already degrade correctly on
    // empty cents (centDists renders a typed NULL → NULL cells → the
    // cell equi-joins match nothing). The seed PREDICATE stays vec_id<k,
    // not a limit(k) over non-NULL rows: the DuckDB oracles replay the
    // seeds as `vec_id < k`, and changing the seed set would silently
    // fork the two engines' quantizers.
    for (_ <- 0 until iters if cents.nonEmpty) {
      // per-cell mean vector as `dim` aggregates: one map-side-combinable
      // shuffle on cell, k result rows — no explode. The mean goes
      // through a decimal-exact sum (the ExactNum pattern): a plain
      // double avg() is partition-order-dependent in its low bits, which
      // would make the refined centroids — and so cell assignments and
      // the query result — vary run to run AND diverge from the DuckDB
      // twin; the decimal sum is order-independent and bit-identical in
      // both engines, at a harmless 1e-15 quantization of the mean.
      // count over v[i], not count(*): emb() deliberately passes NULL
      // vectors through (padding / failed-encode rows), and avg
      // semantics must exclude them from the denominator exactly as
      // sum() excludes them from the numerator — count(*) would count
      // NULL rows and dilute every centroid component (the oracle
      // mirrors with count(v[i]))
      val meanCols = (0 until dim).map(i =>
        (sum(col("v").getItem(i).cast(types.DecimalType(30, 15)))
          .cast("double") / count(col("v").getItem(i))).as(s"m$i"))
      val byCell = nn.select(cellOf(col("v"), cents).as("cell"), col("v"))
        .groupBy("cell").agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (1 to dim).map(r.getDouble).toSeq)
        .toMap
      cents = cents.map { case (id, old) =>
        (id, byCell.getOrElse(id, old)) // empty cell keeps its centroid
      }
    }
    cents
  }

  /** Exact DuckDB twin of `ann_lsh_bucketed`. The seeded hyperplanes
    * are embedded as DOUBLE literals (Scala's Double.toString is
    * round-trip exact, and DuckDB parses decimal literals to the nearest
    * double — the identical value), so bucket ids, cosines, and the
    * per-query top-3 window all reproduce bit-identically: dot products
    * are the same in-order fold on both sides (graft_dot ↔
    * list_dot_product, the convention every cosine oracle here uses).
    * The bit count is the adaptive [[lshBits]] of the corpus count,
    * replayed in SQL ([[lshBitsSql]]) over the prefix-stable literal
    * set.
    */
  private def lshOracle: String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE embedding IS NOT NULL),
        nbv AS (${lshBitsSql("embeddings")}),
        b AS (SELECT vec_id, v, $adaptiveBucketSql AS bucket
              FROM e, nbv),
        q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
              FROM b WHERE vec_id < 20),
        sc AS (SELECT q_id, vec_id,
                 ${cosSql("qv", "v")} AS sim
               FROM q JOIN b ON q_bucket = bucket AND q_id <> vec_id),
        rk AS (SELECT q_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY sim DESC, vec_id) AS rk
               FROM sc)
        SELECT q_id, vec_id AS neighbor_id, ${ExactNum.oracleRound4("sim")} AS cos_sim
        FROM rk WHERE rk <= 3"""
  }

  /** Exact DuckDB twin of `knn_label`: same literal-plane bucket
    * arithmetic as [[lshOracle]], 5-NN per held-out vector among the
    * labeled 80%, then the vote via a (votes DESC, label) window —
    * every ordering key is integral or a bit-identical double, so the
    * hash-compare is exact.
    */
  private def knnLabelOracle: String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                   FROM embeddings WHERE embedding IS NOT NULL),
        nbv AS (${lshBitsSql("embeddings")}),
        b AS (SELECT vec_id, v, label, $adaptiveBucketSql AS bucket
              FROM e, nbv),
        q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket,
                     label AS true_label
              FROM b WHERE vec_id % 5 = 0),
        l AS (SELECT vec_id, v, label, bucket FROM b WHERE vec_id % 5 <> 0),
        sc AS (SELECT q_id, true_label, vec_id, label,
                 ${cosSql("qv", "v")} AS sim
               FROM q JOIN l ON q_bucket = bucket),
        rk AS (SELECT q_id, true_label, vec_id, label, sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY sim DESC, vec_id) AS rk
               FROM sc),
        votes AS (SELECT q_id, true_label, label, count(*) AS votes
                  FROM rk WHERE rk <= 5 GROUP BY q_id, true_label, label),
        win AS (SELECT q_id, true_label, label, votes,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY votes DESC, label) AS vr
                FROM votes)
        SELECT q_id, label AS pred_label, CAST(votes AS BIGINT) AS votes,
               true_label
        FROM win WHERE vr = 1"""
  }

  /** IVF probe width: each query searches its [[NProbe]] nearest cells,
    * the standard recall lever for boundary vectors (a query near a
    * Voronoi face has true neighbors in the adjacent cell; nprobe = 1
    * loses them). Cost is linear in nprobe and bounded by nprobe ×
    * mean-cell-size candidates per query.
    */
  private val NProbe = 3

  /** Exact DuckDB twin of `ann_ivf`: replays the whole deterministic
    * quantizer — seeds = vectors 0..7, two Lloyd iterations, then the
    * [[NProbe]]-cell probe — in SQL. Bit-exactness hinges on two conventions the
    * other cosine oracles already rely on, plus one specific to Lloyd:
    *
    *   - in-order double folds (graft_dot ↔ list_dot_product), so the
    *     |c|² − 2·v·c argmin compares identical doubles on both sides;
    *   - the centroid UPDATE means go through the decimal-exact sum (see
    *     [[ivfCentroids]]) — an order-dependent double avg would drift a
    *     ulp between engines and could flip a cell assignment;
    *   - empty cells keep their previous centroid (LEFT JOIN + coalesce,
    *     mirroring ivfCentroids' getOrElse).
    */
  /** Squared-distance argmin rank over a centroid CTE (cv) — ties break
    * on cell id, mirroring `array_min`'s struct ordering in [[cellOf]].
    */
  private val lloydArgmin = "row_number() OVER (PARTITION BY vec_id " +
    "ORDER BY list_dot_product(cv, cv) - 2 * list_dot_product(v, cv), cell)"

  /** One Lloyd refinement stage over vector CTE `e` and centroid CTE
    * `cPrev`, producing centroid CTE `c\$n` — the SQL replay of
    * [[ivfCentroids]]' iteration (decimal-exact means, empty cells keep
    * their centroid). Shared by the IVF and semantic-dedup oracles.
    */
  private def lloydStage(n: Int, cPrev: String): String =
    s"""a$n AS (SELECT vec_id, v, cell, $lloydArgmin AS rn
                FROM e CROSS JOIN $cPrev),
        ab$n AS (SELECT vec_id, v, cell FROM a$n WHERE rn = 1),
        m$n AS (SELECT cell, i,
                  CAST(sum(CAST(v[i] AS DECIMAL(30,15))) AS DOUBLE)
                    / count(v[i]) AS m
                FROM ab$n CROSS JOIN range(1, ${Dim + 1}) t(i)
                GROUP BY cell, i),
        g$n AS (SELECT cell, list(m ORDER BY i) AS cv FROM m$n
                GROUP BY cell),
        c$n AS (SELECT c.cell, coalesce(g.cv, c.cv) AS cv
                FROM $cPrev c LEFT JOIN g$n g USING (cell))"""

  private def ivfOracle: String = {
    val argmin = lloydArgmin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE embedding IS NOT NULL),
        c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        ${lloydStage(1, "c0")},
        ${lloydStage(2, "c1")},
        asg AS (SELECT vec_id, v, cell FROM (
                  SELECT vec_id, v, cell, $argmin AS rn
                  FROM e CROSS JOIN c2) WHERE rn = 1),
        prb AS (SELECT vec_id AS q_id, v AS qv, cell AS probe_cell FROM (
                  SELECT vec_id, v, cell, $argmin AS rn
                  FROM e CROSS JOIN c2 WHERE vec_id < 20) WHERE rn <= $NProbe),
        sc AS (SELECT q_id, vec_id,
                 ${cosSql("qv", "v")} AS sim
               FROM prb JOIN asg ON probe_cell = cell AND q_id <> vec_id),
        rk AS (SELECT q_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY sim DESC, vec_id) AS rk
               FROM sc)
        SELECT q_id, vec_id AS neighbor_id, ${ExactNum.oracleRound4("sim")} AS cos_sim
        FROM rk WHERE rk <= 3"""
  }

  /** The ann_lsh_bucketed body at an explicit bit count — exposed so
    * SimilaritySpec can drive both sides of the adaptive flip.
    */
  private[graft] def lshTopK(e0: DataFrame, bits: Int): DataFrame = {
    val e = e0.withColumn("bucket", signBucket(col("v"), planes(bits, Dim)))
    val queriesDf = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    queriesDf
      .join(e, col("q_bucket") === col("bucket")
        && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        ExactNum.round4(col("sim")).as("cos_sim"))
  }

  /** The knn_label body at an explicit bit count (see [[lshTopK]]). */
  private[graft] def knnLabel(e0: DataFrame, bits: Int): DataFrame = {
    val e = e0.withColumn("bucket", signBucket(col("v"), planes(bits, Dim)))
    val queriesDf = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("bucket").as("q_bucket"), col("label").as("true_label"))
    val labeled = e.filter(col("vec_id") % 5 =!= 0)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val top = queriesDf
      .join(labeled, col("q_bucket") === col("bucket"))
      .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
        cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
    top.groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      // asc_nulls_last on the label tie-break: embeddings.label is
      // nullable, and on a votes tie Spark's bare asc (NULLS FIRST)
      // would crown a NULL-label vote group while DuckDB's default
      // (NULLS LAST, probed) picks the real label — the
      // sample_stratified ordering fork, pinned here before a NULL
      // label ever ships
      .withColumn("vr", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("votes").desc, col("label").asc_nulls_last)))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("label").as("pred_label"),
        col("votes"), col("true_label"))
  }

  override val queries: Seq[Q] = Seq(

    // Exact top-k neighbours of one query vector (vec_id=0), brute force:
    // broadcast the query row, one scan, TakeOrderedAndProject merge.
    Q("ann_cosine_topk",
      (s, d) => {
        // NULL embeddings take no part in ANY similarity query — the
        // ann_ivf policy applied family-wide (all five unguarded
        // queries + oracles, r13): a NULL vector is not a neighbor
        // candidate, and DuckDB 1.0's vectorized list_dot_product can
        // ERROR chunk-dependently on a parquet scan mixing NULL and
        // real lists (probed), so the oracle-side filter is load-
        // bearing, not just hygiene.
        val e = emb(s, d).where(col("v").isNotNull)
        val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), ExactNum.round4(col("sim")).as("cos_sim"))
      },
      Some(s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                         FROM embeddings
                         WHERE vec_id = 0 AND embedding IS NOT NULL),
                   sc AS (SELECT vec_id,
                            ${cosSql("CAST(embedding AS DOUBLE[])", "qv")} AS sim
                          FROM embeddings, q
                          WHERE vec_id != 0 AND embedding IS NOT NULL)
              SELECT vec_id, ${ExactNum.oracleRound4("sim")} AS cos_sim FROM sc
              ORDER BY sim DESC, vec_id LIMIT 10""")),

    // Embedding-cosine near-duplicate pairs (exact, bounded subset):
    // all pairs among vec_id < 300 with cosine ≥ 0.3.
    Q("emb_cosine_pairs",
      (s, d) => {
        val sub = emb(s, d)
          .filter(col("vec_id") < 300 && col("v").isNotNull)
        sub.as("a").join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            cosine(col("a.v"), col("b.v")).as("sim"))
          .filter(col("sim") >= 0.3)
          .select(col("vec_a"), col("vec_b"), ExactNum.round4(col("sim")).as("cos_sim"))
      },
      Some(s"""WITH sub AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings
                           WHERE vec_id < 300 AND embedding IS NOT NULL),
                   p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                           ${cosSql("a.v", "b.v")} AS sim
                         FROM sub a JOIN sub b ON a.vec_id < b.vec_id)
              SELECT vec_a, vec_b, ${ExactNum.oracleRound4("sim")} AS cos_sim FROM p
              WHERE sim >= 0.3""")),

    // Scale path: sign-LSH bucketed ANN. The bit count adapts to the
    // corpus at runtime ([[lshBits]] of one cheap count — the adaptive
    // cutover discipline): ~2^bits buckets sized for ≤32 mean occupancy,
    // so the same query survives a 10⁶× corpus growth without the
    // per-bucket self-join going quadratic. Candidates = same-bucket
    // rows; top-3 per query via a bounded per-bucket window. Exactly
    // oracled ([[lshOracle]] replays both the bit-count arithmetic and
    // the prefix-stable planes); SimilaritySpec additionally measures
    // recall against the brute-force path and pins planted-pair
    // collision across the bit flip.
    Q("ann_lsh_bucketed",
      (s, d) => lshTopK(emb(s, d).where(col("v").isNotNull),
        lshBits(Tables.load(s, d, "embeddings").count())),
      Some(lshOracle)),

    // kNN label propagation — semi-supervised labeling over the
    // embedding space: every fifth vector is held out as "unlabeled",
    // its label predicted by majority vote of its 5 nearest labeled
    // same-LSH-bucket neighbors (ties: more votes first, then the
    // smaller label id — fully deterministic). The quality-classifier
    // analog on the embedding side: how a pipeline assigns
    // topic/quality labels to new documents from a labeled seed set at
    // corpus scale. Shape: the same runtime-adaptive sign-LSH candidate
    // bound as ann_lsh_bucketed ([[lshBits]] — bits really do scale
    // with corpus size now), one bounded per-query window, one vote
    // aggregate — never an all-pairs scan.
    Q("knn_label",
      (s, d) => knnLabel(emb(s, d).where(col("v").isNotNull),
        lshBits(Tables.load(s, d, "embeddings").count())),
      Some(knnLabelOracle)),

    // Embedding-cosine near-duplicate detection (the dedup-family
    // variant): corpus = embeddings ∪ id-shifted copy; candidates from
    // 16-bit sign-LSH buckets — identical vectors land in the same
    // bucket DETERMINISTICALLY, so planted-dup recall is guaranteed —
    // then exact cosine verify ≥ 0.9. Oracled: the corpus' max
    // non-identical cosine is ~0.6, far under the threshold, so the
    // exact all-pairs DuckDB result equals the bucketed result.
    Q("dedup_embedding",
      (s, d) => {
        val e = emb(s, d).select(col("vec_id"), col("v"))
          .where(col("v").isNotNull)
        val corpus = e.unionByName(
          e.select((col("vec_id") + 1000000L).as("vec_id"), col("v")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // runtime-adaptive level-1 bits ([[lshBits]]); the count doubles
        // as the persisted corpus' pipeline breaker. Recall for the
        // PLANTED signal is bit-count-invariant — identical vectors
        // collide in every bucketing (SimilaritySpec pins this across
        // the flip) — so against THIS corpus, whose only ≥0.9 pairs are
        // the planted identical copies, the result equals the oracle's
        // exact all-pairs at any bit count. A regenerated corpus with
        // non-identical near-dup pairs would make recall (and so the
        // exact-oracle equality) bit-count-dependent — the standard LSH
        // tradeoff, and the oracle gate would surface it as a count
        // mismatch rather than silently.
        val bits = lshBits(corpus.count())
        // skew-guarded buckets: a dense level-1 bucket is replaced by
        // banded sub-bucketings instead of going quadratic (see
        // skewSafeBuckets; exact dups keep colliding in every band).
        // Candidate pairs are DISTINCTed before scoring — a pair
        // colliding in several bands must score once, like the
        // band-deduped candidates in dedup_minhash_lsh.
        val b = skewSafeBuckets(corpus, bits)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r19 sweep): both sides of the bucket self-join
        // below consume this persist inside one action — unbreakered
        // they race the cache fill and re-run the bucketing union per
        // side (the minhash `buckets` mechanism, r18 verdict item 2)
        b.count()
        val cand = b.as("a")
          .join(b.as("b"), col("a.band") === col("b.band")
            && col("a.bucket") === col("b.bucket")
            && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct()
        cand
          .join(corpus.as("x"), col("vec_a") === col("x.vec_id"))
          .join(corpus.as("y"), col("vec_b") === col("y.vec_id"))
          .select(col("vec_a"), col("vec_b"),
            cosine(col("x.v"), col("y.v")).as("sim"))
          .filter(col("sim") >= 0.9)
          .select(col("vec_a"), col("vec_b"), ExactNum.round4(col("sim")).as("cos_sim"))
      },
      Some(s"""WITH corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE embedding IS NOT NULL
                UNION ALL
                SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
                FROM embeddings WHERE embedding IS NOT NULL),
              p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                      ${cosSql("a.v", "b.v")} AS sim
                    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
              SELECT vec_a, vec_b, ${ExactNum.oracleRound4("sim")} AS cos_sim FROM p
              WHERE sim >= 0.9""")),

    // IVF ANN — the second scale path next to sign-LSH: deterministic
    // Lloyd-refined coarse quantizer (8 cells), queries probe their
    // NProbe=3 nearest cells, exact cosine within probed cells, top-3
    // per query.
    // Exactly oracled ([[ivfOracle]] replays the Lloyd loop in SQL);
    // SimilaritySpec additionally pins recall against brute force.
    Q("ann_ivf",
      (s, d) => {
        // NULL embeddings are excluded from the index AND the query
        // set (mirrored by the oracle's `embedding IS NOT NULL`)
        val e = emb(s, d).select(col("vec_id"), col("v"))
          .where(col("v").isNotNull)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val cents = ivfCentroids(e, 8, 2)
        val assigned = e.withColumn("cell", cellOf(col("v"), cents))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r19 sweep): probes and the cell join both
        // consume this persist inside one action (see the minhash
        // `buckets` note, r18 verdict item 2); `e` itself needs none —
        // ivfCentroids' Lloyd collects already materialized its cache
        assigned.count()
        val probes = assigned.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            explode(transform(
              slice(array_sort(centDists(col("v"), cents)), 1, NProbe),
              s => s.getField("i"))).as("probe_cell"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))
        probes
          .join(assigned, col("probe_cell") === col("cell")
            && col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id"),
            cosine(col("qv"), col("v")).as("sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            ExactNum.round4(col("sim")).as("cos_sim"))
      },
      Some(ivfOracle)),

    // Embedding normalization + symmetric int8 quantization — the
    // storage-side prep of an ANN pipeline (a 100 TB embedding store is
    // 4× smaller in int8, and IVF/LSH probes only need approximate
    // geometry). Pure map work: per-row HOF transforms, no shuffle, no
    // UDF. The norm uses the same in-order graft_dot fold as the cosine
    // queries, and the quantized values are emitted as a CSV string so
    // the oracle hash-compare is over scalar columns.
    Q("emb_quantize",
      (s, d) => {
        // maxabs is hoisted into its own column: referencing the
        // aggregate() fold directly inside the per-element transform
        // would re-evaluate the whole d-element fold for EVERY output
        // element (twice — guard and value), turning an O(d) row map
        // into O(d²) codegen (~8k ops/row at d=64; measured 5× slower)
        val maxabs = col("maxabs")
        // all-zero vectors (padding / failed-encode rows) quantize to
        // zeros — without the guard the ANSI division throws
        // DIVIDE_BY_ZERO outright; the guarded branch keeps the exact
        // op order of the oracle so non-degenerate values stay
        // bit-identical
        def q8(x: Column): Column =
          when(maxabs === 0.0, lit(0L))
            .otherwise(round(x * lit(127.0) / maxabs).cast("long"))
            .cast("string")
        emb(s, d).filter(col("v").isNotNull)
          .withColumn("maxabs", aggregate(col("v"), lit(0.0),
            (acc, x) => greatest(acc, abs(x))))
          .select(col("vec_id"),
            ExactNum.round4(sqrt(dot(col("v"), col("v")))).as("l2_norm"),
            concat_ws(",", transform(col("v"), q8(_))).as("q8"))
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings WHERE embedding IS NOT NULL),
                   m AS (SELECT vec_id, v,
                           list_aggregate(list_transform(v, x -> abs(x)),
                             'max') AS maxabs
                         FROM e)
              SELECT vec_id,
                     ${ExactNum.oracleRound4("sqrt(list_dot_product(v, v))")} AS l2_norm,
                     array_to_string(list_transform(v, x ->
                       CAST(CASE WHEN maxabs = 0 THEN 0
                            ELSE CAST(round(x * 127.0 / maxabs) AS BIGINT)
                            END AS VARCHAR)), ',') AS q8
              FROM m""")),

    // Cluster-scoped semantic dedup — the SemDeDup scheme (Abbas et al.
    // 2023): train a coarse k-means quantizer on the embedding corpus
    // (the same deterministic Lloyd loop as ann_ivf), assign every
    // vector to its cell, and flag a vector as a semantic duplicate iff
    // a SMALLER-id vector in the SAME cell has cosine ≥ 0.95. Planted
    // signal: corpus = embeddings ∪ an id-shifted copy of every
    // vec_id % 4 == 0 row — identical vectors share a cell
    // deterministically, so every planted copy must flag.
    //
    // Scale posture: the pairwise stage is confined to cells — in
    // production k grows with the corpus (the paper's regime,
    // k ≈ N/1000) so per-cell membership stays bounded and the
    // self-join is Σ|cell|², never N². Centroid training collects only
    // k×dim doubles per iteration (metadata scale); assignment is a
    // map with the k centroids as literals. A dense cell degrades to
    // the skewSafeBuckets banding exactly like dedup_embedding; at the
    // spec corpus no cell is dense, so the direct form is the plan.
    Q("dedup_semantic",
      (s, d) => {
        // NULL embeddings cannot be semantically deduped: excluded from
        // the corpus and the result (oracle mirrors)
        val e0 = emb(s, d).select(col("vec_id"), col("v"))
          .where(col("v").isNotNull)
        val corpus = e0.unionByName(
          e0.filter(col("vec_id") % 4 === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"), col("v")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val cents = ivfCentroids(corpus, 8, 2)
        val assigned = corpus
          .withColumn("cell", cellOf(col("v"), cents))
          .persist(StorageLevel.MEMORY_AND_DISK)
        assigned.count() // pipeline breaker before the self-join reuse
        val near = assigned.as("a")
          .join(assigned.as("b"), col("a.cell") === col("b.cell")
            && col("a.vec_id") < col("b.vec_id"))
          .select(col("b.vec_id").as("vec_id"),
            cosine(col("a.v"), col("b.v")).as("sim"))
          .filter(col("sim") >= 0.95)
          .groupBy(col("vec_id")).agg(count(lit(1)).as("n_near"))
        assigned.select(col("vec_id"), col("cell"))
          .join(near, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("n_near"), lit(0L)).as("n_near"),
            (coalesce(col("n_near"), lit(0L)) > 0).as("is_dup"))
      },
      Some(semanticOracle))
  )

  /** DuckDB twin of dedup_semantic: the same planted corpus, the same
    * two Lloyd stages ([[lloydStage]] over `e`), then within-cell
    * smaller-id cosine matches ≥ 0.95.
    */
  private def semanticOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE embedding IS NOT NULL
                   UNION ALL
                   SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
                   FROM embeddings
                   WHERE vec_id % 4 = 0 AND embedding IS NOT NULL),
        c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        ${lloydStage(1, "c0")},
        ${lloydStage(2, "c1")},
        asg AS (SELECT vec_id, v, cell FROM (
                  SELECT vec_id, v, cell, $lloydArgmin AS rn
                  FROM e CROSS JOIN c2) WHERE rn = 1),
        pr AS (SELECT b.vec_id,
                 ${cosSql("a.v", "b.v")} AS sim
               FROM asg a JOIN asg b
                 ON a.cell = b.cell AND a.vec_id < b.vec_id),
        nn AS (SELECT vec_id, count(*) AS n_near FROM pr
               WHERE sim >= 0.95 GROUP BY vec_id)
        SELECT asg.vec_id, asg.cell,
               CAST(coalesce(n_near, 0) AS BIGINT) AS n_near,
               coalesce(n_near, 0) > 0 AS is_dup
        FROM asg LEFT JOIN nn USING (vec_id)"""
}
