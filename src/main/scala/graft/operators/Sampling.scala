package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and sequence-packing for training-data pipelines.
  *
  * Every operator here is DETERMINISTIC — a corpus pipeline must be
  * re-runnable to the same sample (resume after failure, audit a
  * training set, diff two pipeline versions), so membership derives from
  * a content hash, never from `rand()`. Determinism is also what makes
  * these fully oracle-able.
  */
object Sampling extends QueryModule {

  /** Documents per prefix-sum leaf bucket (see pack_sequences). Small
    * here so test scales exercise the multi-bucket path; production
    * would size it ~2²⁰ so the bucket-offset table stays metadata-scale
    * (10¹⁰ docs → ~10⁴ buckets).
    */
  private val PackBucket = 256

  /** Context window length for pack_sequences. */
  private val Ctx = 2048

  /** Concat-and-chunk packing over (doc_id, n_tokens) rows — see the
    * pack_sequences query doc for the algorithm. Exposed for the spec,
    * which crosschecks the two-level prefix sum against a naive global
    * window over inputs spanning many buckets.
    */
  private[graft] def packSequences(tokenCounts: DataFrame,
      ctx: Int, bucket: Int): DataFrame = {
    // The zero-token drop is an explode of a HOF-filtered singleton,
    // NOT a `.filter(n_tokens > 0)`: when the caller's n_tokens is an
    // unpersisted tokenize projection (pack_sequences passes
    // wsTokens(text) straight off the scan), predicate pushdown
    // substitutes the alias and lands
    // `size(regexp_extract_all(text,...)) > 0` as a scan-side
    // DataFilter on BOTH scans of the self-join below — the per-row
    // tokenize ran twice per scan (verified r20; the r19
    // pushdown-substitution class, idiom at Dedup.ngramHashes). The
    // explode consumes the alias above the projection, keeps one
    // tokenize per row, and drops non-positive rows exactly like the
    // filter did — type-agnostically (no CASE cast to name the
    // element type, since callers pass int or long counts).
    val tc = tokenCounts
      .select(col("doc_id"), explode(
        expr("filter(array(n_tokens), x -> x > 0)")).as("n_tokens"))
      .withColumn("b", expr(s"doc_id div $bucket"))
    val bucketOffsets = tc.groupBy(col("b"))
      .agg(sum(col("n_tokens")).as("btok"))
      .select(col("b"), coalesce(
        sum(col("btok")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("boff"))
    val intra = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tc.join(bucketOffsets, "b")
      .withColumn("off",
        col("boff") + coalesce(sum(col("n_tokens")).over(intra), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"off div $ctx").as("first_chunk"),
        expr(s"(off + n_tokens - 1) div $ctx").as("last_chunk"))
  }

  /** Skew-safe exact per-stratum quota: identical output to a direct
    * `row_number over (partition by stratum order by key)` ≤ n filter,
    * but no stratum ever funnels through one task. Phase 1 ranks within
    * (stratum, salt) — `salts` bounded partitions per stratum, each
    * holding ~1/salts of the stratum — and keeps each salt's local
    * top-n; phase 2 re-ranks the ≤ n×salts survivors per stratum.
    * Correct because any row in the stratum's global top-n is a fortiori
    * in its own salt's top-n, so phase 1 never discards a winner. Salt =
    * hash of the ordering key (deterministic, no rand()).
    *
    * `df` must carry `stratum` and `key` columns, with `key` UNIQUE
    * within each stratum (ties would make both the direct and the
    * salted rank order-dependent); returns df's columns plus the final
    * `rk`.
    */
  private[graft] def stratifiedQuotaSalted(df: DataFrame, n: Int,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col("key")),
      lit(salts)))
    val local = Window.partitionBy(col("stratum"), col("__salt"))
      .orderBy(col("key"))
    val global = Window.partitionBy(col("stratum")).orderBy(col("key"))
    salted.withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= n)
      .withColumn("rk", row_number().over(global))
      .filter(col("rk") <= n)
      .drop("__salt", "__lrk")
  }

  override val queries: Seq[Q] = Seq(

    // Deterministic ~10% Bernoulli sample: membership = md5(text) hex
    // prefix under a threshold. Pure map-side filter — no shuffle, no
    // state, embarrassingly parallel at any scale, and stable under
    // re-partitioning/re-runs (unlike rand()-based sampling).
    Q("sample_hash",
      (s, d) => Tables.load(s, d, "documents")
        .filter(substring(md5(col("text")), 1, 2) < "1a")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
              WHERE substr(md5(text), 1, 2) < '1a'""")),

    // Per-source weighted sampling — the domain-mixing knob of a
    // pretraining data recipe (up-weight curated sources, down-weight
    // crawl): each source keeps a deterministic fraction of its rows.
    // Membership = md5(text) hex prefix under a per-source threshold
    // ('g' sorts after every hex digit = keep all; '6666'/16⁴ ≈ 40%;
    // '199a'/16⁴ ≈ 10%). Pure map-side filter like sample_hash — no
    // shuffle, no join: at 100 TB the rate map is a literal CASE
    // (metadata), and the sample is stable under re-partitioning,
    // re-runs, and incremental ingest.
    Q("sample_weighted",
      (s, d) => {
        val th =
          when(col("source").isin("src0", "src1", "src2", "src3", "src4"),
            lit("g"))
          .when(col("source").isin("src5", "src6", "src7", "src8", "src9"),
            lit("6666"))
          .otherwise(lit("199a"))
        Tables.load(s, d, "documents")
          .filter(substring(md5(col("text")), 1, 4) < th)
          .select(col("doc_id"), col("source"), col("lang"))
      },
      Some("""SELECT doc_id, source, lang FROM documents
              WHERE substr(md5(text), 1, 4) <
                CASE WHEN source IN ('src0','src1','src2','src3','src4')
                       THEN 'g'
                     WHEN source IN ('src5','src6','src7','src8','src9')
                       THEN '6666'
                     ELSE '199a' END""")),

    // Stratified sampling: an exact per-language quota, picked in
    // content-hash order so the quota is deterministic and unbiased by
    // storage order. One shuffle on the stratum key; rows beyond the
    // quota are dropped by the windowed rank. (For strata too hot for a
    // single partition, stratifiedQuotaSalted below is the provably
    // equal skew-safe path.)
    Q("sample_stratified",
      (s, d) => {
        // asc_nulls_last: md5(NULL text) is NULL in both engines, but
        // Spark's ascending sort defaults NULLS FIRST while DuckDB
        // defaults NULLS LAST — a NULL-text doc (failed fetch) would
        // take rank 1 here and rank >quota in the oracle. Pinning
        // NULLS LAST makes the two engines agree AND keeps content-less
        // docs out of the quota unless the stratum underflows.
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")).asc_nulls_last, col("doc_id"))
        Tables.load(s, d, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select(col("lang"), col("doc_id"), col("rk"))
      },
      Some("""SELECT lang, doc_id, rk FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY md5(text), doc_id) AS rk
                FROM documents) t
              WHERE rk <= 20""")),

    // Token-budget mixture planning — the recipe arithmetic of a
    // pretraining data mix: given per-tier mixture weights (a literal
    // CASE — metadata, exactly like sample_weighted's rate map) and a
    // total token budget, compute per source the available supply and
    // the plan: target tokens, sampling rate (≤ 1), and epochs (> 1 =
    // the source repeats — the up-sampling a weight-heavy small source
    // needs). ONE map-side-combined aggregate over the corpus; token
    // counts are integer sums, so both engines agree bit-exactly, and
    // the only doubles are per-source ratios of those integers.
    Q("mix_budget",
      (s, d) => {
        // weights in PER-MILLE integers and the target in integer
        // division: every pre-ratio column is exact bigint arithmetic
        // both engines agree on bit-for-bit; the only doubles are final
        // ratios of those bigints (identical IEEE division)
        val budget = 1000000L
        val wpm = when(col("source")
            .isin("src0", "src1", "src2", "src3", "src4"), lit(100L))
          .when(col("source")
            .isin("src5", "src6", "src7", "src8", "src9"), lit(60L))
          .otherwise(lit(20L))
        Tables.load(s, d, "documents")
          .select(col("source"),
            TextOps.wsTokens(col("text")).cast("bigint").as("n_tokens"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"))
          .withColumn("weight_pm", wpm)
          .withColumn("target_tokens",
            expr(s"($budget * weight_pm) div 1000"))
          .withColumn("rate", ExactNum.round4(
            least(lit(1.0), col("target_tokens") / col("n_tokens"))))
          .withColumn("epochs", ExactNum.round4(
            col("target_tokens") / col("n_tokens")))
      },
      Some("""SELECT source, n_docs, n_tokens, weight_pm,
                     (1000000 * weight_pm) // 1000 AS target_tokens,
                     (round((least(1.0,
                       ((1000000 * weight_pm) // 1000) / n_tokens))
                       * 10000) / 10000.0) AS rate,
                     (round((((1000000 * weight_pm) // 1000) / n_tokens)
                       * 10000) / 10000.0) AS epochs
              FROM (SELECT source, count(*) AS n_docs,
                      CAST(sum(len(regexp_extract_all(text, '\S+')))
                        AS BIGINT) AS n_tokens,
                      CASE WHEN source IN
                             ('src0','src1','src2','src3','src4') THEN 100
                           WHEN source IN
                             ('src5','src6','src7','src8','src9') THEN 60
                           ELSE 20 END AS weight_pm
                    FROM documents GROUP BY source) t""")),

    // Deterministic global shuffle + sharding — the step that lays a
    // curated corpus out as training shards: every document gets a
    // pseudorandom but reproducible position (content-hash order, never
    // rand()), split across N shards, each shard internally ordered.
    // Shard assignment is a map-side hex-digit range on md5 (the
    // instr-on-'0123456789abcdef' form evaluates identically in Spark
    // SQL and DuckDB — no engine-specific hex-to-int conversion); the
    // only shuffle is the shard-partitioned window that numbers each
    // shard's rows.
    //
    // Scale posture: shard count IS the parallelism knob — each shard's
    // rank is one partition-local sort, so production sizes shards at
    // ≥ cluster cores (10⁴ shards at 100 TB ≈ 10 GB/shard, partition-
    // sized); 8 here keeps every shard visibly non-empty at test scale.
    // Rows never funnel through a global order — the naive
    // `row_number() OVER (ORDER BY hash)` would be a one-task corpus
    // sort. Re-runs, re-partitioning, and incremental ingest keep every
    // (doc → shard, pos ordering) stable except positions after an
    // inserted document inside one shard — the audit property a
    // training-data layout needs.
    Q("shuffle_shard",
      (s, d) => {
        val h = md5(col("text"))
        Tables.load(s, d, "documents")
          .withColumn("ord", h)
          .withColumn("shard",
            expr("CAST((instr('0123456789abcdef', substring(ord, 1, 1))" +
              " - 1) div 2 AS INT)"))
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("shard"))
              .orderBy(col("ord"), col("doc_id"))))
          .select(col("doc_id"), col("shard"), col("pos"))
      },
      Some("""SELECT doc_id, shard, CAST(pos AS INTEGER) AS pos FROM (
                SELECT doc_id, shard,
                       row_number() OVER (PARTITION BY shard
                         ORDER BY ord, doc_id) AS pos
                FROM (SELECT doc_id, md5(text) AS ord,
                        CAST((instr('0123456789abcdef',
                          substring(md5(text), 1, 1)) - 1) // 2 AS INTEGER)
                          AS shard
                      FROM documents) x) y""")),

    // Concat-and-chunk sequence packing — the layout step of LLM
    // training: documents are concatenated in doc_id order and split
    // into fixed-length context windows; each document maps to the chunk
    // range [first_chunk, last_chunk] it lands in. The global token
    // offset is a distributed two-level prefix sum:
    //   1. per-bucket token totals (one map-side-combined aggregate),
    //   2. running offsets over the BUCKET table (a single-partition
    //      window — but over bucket aggregates, metadata-scale, like
    //      ANALYZE stats),
    //   3. intra-bucket running sum (window PARTITIONED by bucket).
    // No data-scale single-partition stage anywhere — the naive global
    // `Window.orderBy(doc_id)` would funnel the corpus through one task.
    Q("pack_sequences",
      (s, d) => packSequences(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), TextOps.wsTokens(col("text")).as("n_tokens")),
        Ctx, PackBucket),
      Some(s"""SELECT doc_id, n_tokens,
                      CAST(off // $Ctx AS BIGINT) AS first_chunk,
                      CAST((off + n_tokens - 1) // $Ctx AS BIGINT) AS last_chunk
               FROM (SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS off
                     FROM (SELECT doc_id,
                             len(regexp_extract_all(text, '\\S+')) AS n_tokens
                           FROM documents) tc
                     WHERE n_tokens > 0) o"""))
  )
}
