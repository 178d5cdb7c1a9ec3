package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Second corpus-pipeline family: tokenizer training (BPE merge
  * learning), exact quantile bucketing without a global sort, and
  * content-defined-chunking dedup (the shift-robust complement to
  * [[PipelineOps]]'s aligned-block `dedup_passage`).
  *
  * The reference has no text surface at all (tinysql's
  * `expression/builtin_string.go` stops at LENGTH/STRCMP) — these are
  * the pretraining-corpus stages a user of this engine needs at 100 TB,
  * expressed as declarative DataFrame shapes so Catalyst keeps them in
  * whole-stage codegen.
  *
  * Scale posture:
  *   - `bpe_train` touches the corpus ONCE (word counting); the merge
  *     loop then iterates over the distinct-WORD relation, which is
  *     vocabulary-scale (sublinear in corpus tokens) and persisted.
  *     Each iteration is one map-side-combined pair-count aggregate
  *     plus a 1-row driver collect — K metadata-scale jobs, never a
  *     corpus rescan.
  *   - `quality_buckets` replaces the naive ntile (a total sort through
  *     ONE partition — the classic 100 TB cliff) with a value
  *     histogram: one hash agg on the score value, a window over the
  *     DISTINCT-VALUE relation (bounded by the score domain, not the
  *     corpus), and one join back. Identical tie semantics, no global
  *     sort anywhere.
  *   - `dedup_cdc` derives chunk boundaries from content (md5 of the
  *     token), so an inserted prefix only perturbs the chunk containing
  *     the edit; everything per-document is a doc_id-local window
  *     (state bounded by max doc length), and the cross-corpus census
  *     is one hash agg on 16-byte digests.
  */
object CorpusOps extends QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Symbol separator / end-of-word sentinels for the BPE symbol
    * string. Control characters that cannot occur in the corpus —
    * CorpusOpsSpec asserts the precondition (tokens are ASCII \S+, so
    * neither \x01 nor \x02 appears).
    */
  private val SEP = "\u0001"
  private val EOW = "\u0002"

  /** Number of BPE merges learned (and mirrored in the oracle CTE
    * chain). Each merge costs one vocabulary-scale aggregate.
    */
  private val BPE_MERGES = 12

  /** DuckDB twin of the BPE merge loop: a generated K-stage CTE chain
    * (shared by the `bpe_train` and `bpe_encode` oracles). Stage i
    * extracts adjacent symbol pairs from the symbol strings, picks the
    * (count DESC, s1, s2) best pair with a scalar-subquery LIMIT 1,
    * and applies the merge via `replace`. Every symbol is wrapped in
    * its OWN \x01 pair (`\x01sym\x01`, so the string has \x01\x01
    * between symbols): adjacent matches then share no characters, and
    * left-to-right non-overlapping `replace` — identical in Java and
    * DuckDB — is exactly the greedy left-to-right merge of standard
    * BPE (Sennrich et al. 2016). With a SHARED separator, 'aaaa' under
    * merge (a,a) would yield [aa,a,a] instead of the correct [aa,aa],
    * because the first match consumes the separator the second needs
    * (caught by CorpusOpsSpec's adversarial-vocab equivalence test).
    * Every stage is MATERIALIZED: DuckDB inlines plain CTEs, and the
    * ~4 references per stage would re-expand the chain exponentially
    * (the first attempt died on 4^12 parquet opens).
    */
  /** Shared WITH-chain for the BPE oracles. The w$i CASE guard matters
    * on EXHAUSTION (pair inventory empty before K merges — a degenerate
    * one-letter-vocabulary corpus): an empty b$i makes the scalar
    * subqueries NULL, and DuckDB's replace(repr, NULL, NULL) NULLs
    * EVERY repr, cascading through all later stages until the encode
    * census returns zero rows while the engine emits the true top-50.
    * The guard turns an exhausted merge into the no-op the engine's own
    * `exhausted` break performs.
    */
  private def bpeChain(k: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH occ AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
                      FROM documents),
         wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM occ GROUP BY w),
         w0 AS MATERIALIZED (SELECT cnt,
                       chr(1) || regexp_replace(w, '(.)', '\1' || chr(1) || chr(1), 'g')
                              || chr(2) || chr(1) AS repr
                FROM wc)"""
    for (i <- 1 to k) {
      val prev = s"w${i - 1}"
      sb ++= s""",
         p$i AS MATERIALIZED (SELECT s1, s2, sum(cnt) AS c FROM (
                   SELECT cnt, unnest(sy[1:len(sy)-1]) AS s1,
                               unnest(sy[2:len(sy)]) AS s2
                   FROM (SELECT cnt,
                                list_filter(string_split(repr, chr(1)),
                                            x -> x <> '') AS sy
                         FROM $prev)
                   WHERE len(sy) >= 2)
                 GROUP BY s1, s2),
         b$i AS MATERIALIZED (SELECT s1, s2, c FROM p$i ORDER BY c DESC, s1, s2 LIMIT 1),
         w$i AS MATERIALIZED (SELECT cnt,
                   CASE WHEN (SELECT count(*) FROM b$i) = 0 THEN repr
                        ELSE replace(repr,
                          chr(1) || (SELECT s1 FROM b$i) || chr(1) || chr(1) ||
                                    (SELECT s2 FROM b$i) || chr(1),
                          chr(1) || (SELECT s1 || s2 FROM b$i) || chr(1))
                   END AS repr
                 FROM $prev)"""
    }
    sb.toString
  }

  private def bpeTrainOracle(k: Int): String =
    bpeChain(k) + "\n         " + (1 to k).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS iter,
                 replace(s1, chr(2), '</w>') AS s1,
                 replace(s2, chr(2), '</w>') AS s2,
                 replace(s1 || s2, chr(2), '</w>') AS merged,
                 CAST(c AS BIGINT) AS cnt
          FROM b$i""").mkString(" UNION ALL ")

  /** Subword vocabulary after the K merges: rank on the RAW symbol (the
    * \x02 end-of-word byte), display with the `</w>` convention — both
    * engines order bytewise on ASCII + control chars, so the tie-break
    * agrees.
    */
  private def bpeEncodeOracle(k: Int): String =
    bpeChain(k) + s""",
         sel AS (SELECT sym, sum(cnt) AS c FROM (
                   SELECT cnt,
                          unnest(list_filter(string_split(repr, chr(1)),
                                             x -> x <> '')) AS sym
                   FROM w$k)
                 GROUP BY sym),
         top AS (SELECT sym, c,
                        row_number() OVER (ORDER BY c DESC, sym) AS rank
                 FROM sel)
         SELECT replace(sym, chr(2), '</w>') AS subword,
                CAST(c AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank
         FROM top WHERE rank <= 50"""

  /** The shared merge loop: persist the vocabulary-scale word table,
    * learn K merges (one pair-count aggregate + a 1-row argmax collect
    * each), hand (merges, final symbol table) to `finish` — which must
    * MATERIALIZE anything derived from the symbol table before
    * returning, because the persisted base is unpersisted on exit.
    */
  private def withBpe[T](s: SparkSession, d: String)(
      finish: (Seq[(Long, String, String, String, Long)], DataFrame) => T): T =
    bpeLoop(Dedup.tokens(docs(s, d)), BPE_MERGES)(finish)

  /** Driver-side vocabulary bound for the adaptive in-memory merge
    * replay (the connectedComponents fast-path precedent): under it,
    * the (cnt, repr) vocabulary is collected ONCE and the K merge
    * iterations run in memory — K in-process passes instead of K
    * aggregate jobs. Over it, the distributed loop runs unchanged (a
    * 100 TB corpus can have a billion-word vocabulary). Both paths use
    * the same primitives — \x01 split, (count DESC, s1, s2) argmax with
    * UTF-8 byte string comparison ([[Utf8Order]] — Java's UTF-16
    * ordering would diverge on supplementary characters), literal
    * left-to-right replace — so the merges are bit-identical
    * (spec-pinned equivalence, including a non-BMP alphabet case).
    */
  private val DriverVocabLimit = 2000000L

  /** Companion BYTE bound for the fast path: [[DriverVocabLimit]] bounds
    * collected ROWS, but each repr is the SEP-expanded form (~3× token
    * chars), so a vocabulary of long tokens could pass the row check
    * while putting hundreds of MB of tuples on the driver. The cutover
    * aggregate therefore also sums repr octet_length (UTF-8 BYTES, not
    * codepoints — a CJK/astral vocabulary packs up to 4 payload bytes
    * per codepoint, so a char count would undercount by 4×) and the
    * fast path requires BOTH bounds. 256 MB of repr payload ≈ well
    * under a GB of heap with String/tuple overhead — trivially safe on
    * any driver.
    */
  private val DriverVocabByteLimit = 256L << 20

  /** Exposed with an arbitrary token-array source and merge count so the
    * spec can drive adversarial synthetic vocabularies (self-overlapping
    * merges like "aaaa") through the EXACT production loop;
    * driverVocabLimit = 0 forces the distributed path.
    */
  private[graft] def bpeLoop[T](toks: DataFrame, k: Int,
      driverVocabLimit: Long = DriverVocabLimit,
      driverVocabByteLimit: Long = DriverVocabByteLimit)(
      finish: (Seq[(Long, String, String, String, Long)], DataFrame) => T): T = {
    val words = toks
      .select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(SEP), regexp_replace(col("w"), "(.)", "$1" + SEP + SEP),
          lit(EOW + SEP)).as("repr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = Seq.newBuilder[(Long, String, String, String, Long)]
      // ONE aggregate job decides the cutover (and doubles as the
      // persist-materializing pipeline breaker the count() used to be):
      // row count for the collect bound, total repr chars for the byte
      // bound.
      val cut = words.agg(count(lit(1)).as("n"),
        coalesce(sum(octet_length(col("repr"))), lit(0L)).as("bytes")).head()
      // Both paths stop identically when the pair inventory is exhausted
      // before k merges (a degenerate vocabulary — e.g. every word a
      // single character — runs out of adjacent pairs): the merge list
      // is simply shorter. Without the guard the fast path would throw
      // empty.minBy and the distributed path would index an empty
      // collect; spec-pinned equivalence includes the truncated case.
      if (cut.getLong(0) <= driverVocabLimit &&
          cut.getLong(1) <= driverVocabByteLimit) {
        var cur = words.collect().map(r => (r.getLong(0), r.getString(1)))
        var exhausted = false
        for (i <- 1 to k if !exhausted) {
          val pc = scala.collection.mutable.Map
            .empty[(String, String), Long].withDefaultValue(0L)
          cur.foreach { case (cnt, repr) =>
            val sy = repr.split(SEP).filter(_.nonEmpty)
            var j = 0
            while (j + 1 < sy.length) { pc((sy(j), sy(j + 1))) += cnt; j += 1 }
          }
          if (pc.isEmpty) exhausted = true
          else {
            // (count DESC, s1, s2) argmax with the STRING legs compared
            // as UTF-8 bytes (Utf8Order) — the distributed orderBy and
            // the DuckDB oracle both use UTF-8 binary ordering, and
            // Java's UTF-16 tuple ordering diverges on supplementary
            // characters, so a plain minBy would pick different merges
            // on an astral-token corpus
            val ((m1, m2), c) = pc.toSeq
              .minBy { case ((a, b), n) => (-n, a, b) }(
                Ordering.Tuple3(Ordering.Long, Utf8Order, Utf8Order))
            merges += ((i.toLong, bpeDisp(m1), bpeDisp(m2), bpeDisp(m1 + m2), c))
            val pat = SEP + m1 + SEP + SEP + m2 + SEP
            val rep = SEP + m1 + m2 + SEP
            cur = cur.map { case (cnt, repr) => (cnt, repr.replace(pat, rep)) }
          }
        }
        import toks.sparkSession.implicits._
        finish(merges.result(), cur.toSeq.toDF("cnt", "repr"))
      } else {
        var cur = words
        var exhausted = false
        for (i <- 1 to k if !exhausted) {
          val pairs = symbols(cur)
            .filter(size(col("s")) >= 2)
            .select(col("cnt"), explode(expr(
              """transform(sequence(1, size(s) - 1),
                 i -> struct(element_at(s, i) AS s1, element_at(s, i + 1) AS s2))"""))
              .as("p"))
            .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
            .agg(sum(col("cnt")).as("c"))
          val best = pairs.orderBy(col("c").desc, col("s1"), col("s2"))
            .limit(1).collect()
          if (best.isEmpty) exhausted = true
          else {
            val (m1, m2, c) =
              (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
            merges += ((i.toLong, bpeDisp(m1), bpeDisp(m2), bpeDisp(m1 + m2), c))
            cur = cur.select(col("cnt"),
              replace(col("repr"), lit(SEP + m1 + SEP + SEP + m2 + SEP),
                lit(SEP + m1 + m2 + SEP)).as("repr"))
          }
        }
        finish(merges.result(), cur)
      }
    } finally words.unpersist()
  }

  /** (cnt, s) with s = the word's symbol array — the repr split on
    * \x01, empties dropped (each symbol is wrapped in its own \x01
    * pair, so splitting leaves an empty between adjacent symbols and
    * at both ends; symbols themselves are never empty).
    */
  private def symbols(words: DataFrame): DataFrame =
    words.select(col("cnt"),
      expr(s"filter(split(repr, '$SEP'), x -> x != '')").as("s"))

  private def bpeDisp(x: String): String = x.replace(EOW, "</w>")


  /** TextRank iterations for the oracle: a generated K-stage
    * MATERIALIZED CTE chain over the top-100-token co-occurrence graph.
    * Every per-edge contribution is floored integer micro-units
    * ((r·w·17) // (W·20) — damping 0.85 = 17/20), so the per-node sum
    * is order-independent and the whole fixpoint is bit-identical
    * across engines; a double-arithmetic PageRank could never be
    * hash-compared.
    */
  private def textRankOracle(k: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH toks AS (SELECT regexp_extract_all(lower(text), '\S+') AS t
                       FROM documents),
         occ AS (SELECT unnest(t) AS tok FROM toks),
         vc AS MATERIALIZED (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
         nodes AS MATERIALIZED (SELECT tok FROM vc
                                ORDER BY cnt DESC, tok LIMIT 100),
         bg AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
                FROM toks WHERE len(t) >= 2),
         bc AS MATERIALIZED (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
         sym AS (SELECT w1 AS src, w2 AS dst, c FROM bc
                 UNION ALL
                 SELECT w2 AS src, w1 AS dst, c FROM bc),
         e AS MATERIALIZED (SELECT src, dst, sum(c) AS w FROM sym
                            JOIN nodes ns ON ns.tok = sym.src
                            JOIN nodes nd ON nd.tok = sym.dst
                            GROUP BY src, dst),
         outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e GROUP BY src),
         r0 AS MATERIALIZED (SELECT tok, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for (i <- 1 to k) sb ++= s""",
         r$i AS MATERIALIZED (
           SELECT n.tok,
                  CAST(150000 + coalesce(sum(m.t), 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.dst, (p.r * e.w * 17) // (o.ow * 20) AS t
             FROM e JOIN r${i - 1} p ON p.tok = e.src
                    JOIN outw o ON o.src = e.src) m
             ON m.dst = n.tok
           GROUP BY n.tok)"""
    sb ++= s""",
         top AS (SELECT tok, r,
                        row_number() OVER (ORDER BY r DESC, tok) AS rank
                 FROM r$k)
         SELECT tok, CAST(r AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
         FROM top WHERE rank <= 20"""
    sb.toString
  }

  private val TEXTRANK_ITERS = 5

  override val queries: Seq[Q] = Seq(

    // BPE tokenizer training — learn the first K merge rules over the
    // corpus vocabulary (the classic Sennrich et al. loop). Words are
    // \x01-separated symbol strings ending in an end-of-word sentinel;
    // each iteration counts adjacent symbol pairs weighted by word
    // frequency, picks the most frequent pair (count DESC, then
    // lexicographic — deterministic across engines: ASCII + control
    // chars compare bytewise identically), and rewrites every word via
    // left-to-right non-overlapping `replace`. The corpus is scanned
    // exactly once (word counting); all K iterations run against the
    // persisted vocabulary-scale word table, and the only driver
    // traffic is K single-row argmax collects.
    Q("bpe_train",
      (s, d) => {
        import s.implicits._
        withBpe(s, d)((merges, _) =>
          merges.toDF("iter", "s1", "s2", "merged", "cnt"))
      },
      Some(bpeTrainOracle(BPE_MERGES))),

    // BPE application — the other half of the tokenizer: re-segment the
    // vocabulary with the learned merges and emit the top-50 subword
    // units by corpus frequency. Reuses the SAME merge loop and oracle
    // CTE chain as bpe_train (train and encode cannot drift); the
    // subword census is one vocabulary-scale aggregate, and only the
    // 50-row result reaches the driver.
    Q("bpe_encode",
      (s, d) => {
        import s.implicits._
        withBpe(s, d) { (_, cur) =>
          val top = symbols(cur)
            .select(col("cnt"), explode(col("s")).as("sym"))
            .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("sym")).limit(50).collect()
          top.zipWithIndex.toSeq.map { case (r, i) =>
            (bpeDisp(r.getString(0)), r.getLong(1), (i + 1).toLong)
          }.toDF("subword", "cnt", "rank")
        }
      },
      Some(bpeEncodeOracle(BPE_MERGES))),

    // Exact decile bucketing WITHOUT a global sort — the scalable
    // ntile. Score = document length in tokens (the curriculum /
    // length-filter axis); bucket = ceil(10 * rank-with-ties / N),
    // computed as pure integer arithmetic so both engines agree
    // bit-for-bit (a double cume_dist would round on exact-decile
    // boundaries). Shape: one hash agg score→count, a cumulative
    // window over the DISTINCT-SCORE relation only (bounded by the
    // score domain — never the corpus), one broadcast-size join back.
    // Ties land in the same bucket by construction, which ntile cannot
    // guarantee.
    Q("quality_buckets",
      (s, d) => {
        // text IS NOT NULL on both sides: a failed-fetch doc has NULL
        // score, which the engines place at OPPOSITE ends of the
        // cumulative window (Spark NULLS FIRST vs DuckDB NULLS LAST —
        // the sample_stratified fork), inflating every non-NULL cum by
        // the NULL count, and the final equi-join on score silently
        // DROPS the NULL docs from the Spark output while the oracle
        // keeps them. A score-less doc belongs in no decile anyway;
        // the explicit filter is the one policy both engines express
        // identically (the join_asof ts precedent). sc is deliberately
        // NOT persisted: the histogram's exchange is reused for cum and
        // total (ReuseExchange), so the corpus tokenize runs twice (the
        // hist exchange + the join-back scan), and those stages
        // pipeline in parallel — a persist here forces a sequential
        // materialize-then-consume barrier that measured ~2x slower at
        // sf0.1 (0.58 s -> 1.0-1.2 s isolated, healthy probes) for a
        // cache the plan reads back only once.
        // score is wrapped non-nullable (coalesce with a dead -1
        // sentinel — text is already filtered NOT NULL, so size(t) is
        // never null): without it, the final equi-join on score makes
        // constraint inference add `isnotnull(score)`, whose alias
        // substitution lands isnotnull(size(regexp_extract_all(...)))
        // as a scan-side DataFilter and re-runs the join-back scan's
        // tokenize twice per row (verified r20 — the r19
        // pushdown-substitution class via an INFERRED predicate; the
        // non-nullable alias stops the inference at the source)
        val sc = Dedup.tokens(docs(s, d).where(col("text").isNotNull))
          .select(col("doc_id"),
            coalesce(size(col("t")).cast("long"), lit(-1L)).as("score"))
        val hist = sc.groupBy(col("score")).agg(count(lit(1)).as("c"))
        val cum = hist.withColumn("cum",
          sum(col("c")).over(Window.orderBy(col("score"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val total = hist.agg(sum(col("c")).as("n"))
        val buckets = cum.crossJoin(broadcast(total))
          .select(col("score"),
            expr("(10 * cum + n - 1) div n").as("bucket"))
        sc.join(buckets, Seq("score"))
          .select(col("doc_id"), col("score"), col("bucket"))
      },
      Some("""WITH sc AS (SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
                       AS score
                   FROM documents WHERE text IS NOT NULL),
              n AS (SELECT count(*) AS n FROM sc),
              cum AS (SELECT doc_id, score,
                             count(*) OVER (ORDER BY score) AS cum
                      FROM sc)
              SELECT doc_id, score,
                     CAST((10 * cum + n.n - 1) // n.n AS BIGINT) AS bucket
              FROM cum CROSS JOIN n""")),

    // Content-defined-chunking dedup — the shift-robust complement to
    // dedup_passage's aligned blocks. A chunk boundary falls AFTER any
    // token whose md5 starts with hex 0 or 1 (p = 1/8 ⇒ mean chunk ≈ 8
    // tokens), so chunk identity depends only on content, not position:
    // a planted one-token-prefixed excerpt ('zzz ' + tokens 1..24 of
    // every doc_id % 7 == 0 doc) still shares every post-boundary chunk
    // with its source — aligned blocks would miss all of them. Chunk
    // assembly is pure per-row array HOFs — boundary positions, start/end
    // zip, slice-and-hash — so the corpus pass is map-only (no per-doc
    // window sort, no (doc_id, chunk) exchange); the only shuffles are
    // the digest census and the final doc_id aggregate. The DuckDB twin
    // deliberately keeps the explode + window + string_agg formulation:
    // two independent derivations agreeing is a stronger oracle than a
    // mirrored one.
    Q("dedup_cdc",
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), lower(col("text")).as("text"))
        val corp = base.unionAll(
          base.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 3000000L).as("doc_id"),
              concat(lit("zzz "),
                array_join(slice(Dedup.tokenArr(col("text")), 1, 24), " "))
                .as("text")))
        // per-doc chunk digests: boundaries AFTER tokens whose md5 opens
        // with hex 0/1; a boundary on the last token would open an empty
        // chunk, which the s <= e zip filter drops. The tokenize +
        // per-token-md5 chain is the profiled cost — fan it out past
        // file parallelism first (the ccCorpusTokens pattern; a single
        // local parquet split would otherwise run it on one task)
        val cg = corp
          .repartition(col("doc_id"))
          .select(col("doc_id"), Dedup.tokenArr(col("text")).as("t"))
          .withColumn("barr", expr(
            // 0-token docs have no boundaries: sequence(1, 0) silently
            // DESCENDS ([1, 0]) and element_at(t, 1) then errors on the
            // empty array — guard to the typed empty list
            """filter(
                 CASE WHEN size(t) >= 1 THEN sequence(1, size(t))
                      ELSE CAST(array() AS ARRAY<INT>) END,
                 i -> substring(md5(element_at(t, i)), 1, 1) IN ('0', '1'))"""))
          .withColumn("h", explode(expr(
            """transform(
                 filter(zip_with(concat(array(1), transform(barr, b -> b + 1)),
                                 concat(barr, array(size(t))),
                                 (s, e) -> struct(s AS s, e AS e)),
                        p -> p.s <= p.e),
                 c -> md5(array_join(slice(t, c.s, c.e - c.s + 1), ' ')))""")))
          .select(col("doc_id"), col("h"))
        val census = cg.groupBy(col("h")).agg(count(lit(1)).as("c"))
        cg.join(census, Seq("h"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("c") >= 2, 1)).as("n_dup_chunks"))
      },
      Some("""WITH base AS (SELECT doc_id, lower(text) AS text FROM documents),
              corp AS (SELECT doc_id, text FROM base
                       UNION ALL
                       SELECT doc_id + 3000000,
                              'zzz ' || array_to_string(list_slice(
                                regexp_extract_all(text, '\S+'), 1, 24), ' ')
                       FROM base WHERE doc_id % 7 = 0),
              toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                       FROM corp),
              occ AS (SELECT doc_id, unnest(t) AS tok,
                             unnest(range(0, len(t))) AS pos
                      FROM toks),
              fl AS (SELECT doc_id, pos, tok,
                            CASE WHEN substring(md5(tok), 1, 1) IN ('0', '1')
                                 THEN 1 ELSE 0 END AS b
                     FROM occ),
              ch AS (SELECT doc_id, pos, tok,
                            coalesce(sum(b) OVER (PARTITION BY doc_id
                              ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS chunk
                     FROM fl),
              cg AS (SELECT doc_id, chunk,
                            md5(string_agg(tok, ' ' ORDER BY pos)) AS h
                     FROM ch GROUP BY doc_id, chunk),
              census AS (SELECT h, count(*) AS c FROM cg GROUP BY h)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                     CAST(count(*) FILTER (c >= 2) AS BIGINT) AS n_dup_chunks
              FROM cg JOIN census USING (h) GROUP BY doc_id""")),

    // TextRank keyword scoring — PageRank on the token co-occurrence
    // graph (Mihalcea & Tarau's TextRank, the corpus-keyword shape).
    // Nodes: the top-100 tokens by frequency; edges: symmetrized
    // adjacent-bigram counts between them; 5 damped iterations
    // r' = 0.15 + 0.85·Σ r·w/W in integer micro-units with per-edge
    // flooring, so the sum is order-independent and the DuckDB twin
    // matches bit-for-bit (double PageRank could never hash-compare).
    //
    // Scale shape: ONE corpus pass (the bigram + token censuses, both
    // map-side-combined hash aggs). The pruned graph is bounded by the
    // FIXED 100-node vocab cap — ≤ 9,900 edges at ANY corpus size — so
    // the 5 damped iterations run driver-side on the collected edge
    // list (the ann_ivf Lloyd-loop precedent: metadata-scale collects
    // are fine). The r7-style alternative — composing each iteration as
    // broadcast joins — re-derived the same 100-row vector through five
    // chained broadcast stages and cost ~13 s of pure scheduling at
    // sf0.1; the collect form is one extra driver round-trip and zero
    // per-iteration jobs, with identical integer arithmetic.
    Q("text_rank",
      (s, d) => {
        import s.implicits._
        val toks = Dedup.tokens(docs(s, d)).persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r19 sweep): the node census and the bigram
        // explode both consume this persist inside one action
        toks.count()
        val nodes = toks.select(explode(col("t")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(100)
          .select(col("tok"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val bc = toks.filter(size(col("t")) >= 2)
          .select(explode(expr(PipelineOps.bigramStructsExpr)).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        val sym = bc.select(col("w1").as("src"), col("w2").as("dst"), col("c"))
          .unionAll(bc.select(col("w2").as("src"), col("w1").as("dst"), col("c")))
        val e = sym
          .join(broadcast(nodes.withColumnRenamed("tok", "src")), "src")
          .join(broadcast(nodes.withColumnRenamed("tok", "dst")), "dst")
          .groupBy(col("src"), col("dst")).agg(sum(col("c")).as("w"))
        val edges = e.collect().map(r =>
          (r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[Long]("w")))
        val nodeToks = nodes.collect().map(_.getString(0))
        val ow: Map[String, Long] =
          edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
        var r: Map[String, Long] = nodeToks.map(_ -> 1000000L).toMap
        for (_ <- 1 to TEXTRANK_ITERS) {
          val inmass = scala.collection.mutable.Map.empty[String, Long]
            .withDefaultValue(0L)
          for ((src, dst, w) <- edges)
            inmass(dst) += r(src) * w * 17 / (ow(src) * 20)
          r = nodeToks.map(t => t -> (150000L + inmass(t))).toMap
        }
        nodeToks.map(t => (t, r(t)))
          // UTF-8 byte tie-break (Utf8Order): the oracle's ORDER BY is
          // UTF-8 binary, Java's String ordering is UTF-16 — see the BPE
          // argmax note
          .sortBy { case (t, sc) => (-sc, t) }(
            Ordering.Tuple2(Ordering.Long, Utf8Order)).take(20)
          .zipWithIndex
          .map { case ((t, sc), i) => (t, sc, (i + 1).toLong) }
          .toSeq.toDF("tok", "score", "rank")
      },
      Some(textRankOracle(TEXTRANK_ITERS))),

    // Pointwise-mutual-information collocations — the classic
    // collocation extractor (Church & Hanks): bigrams whose observed
    // frequency most exceeds the unigram-independence expectation,
    // PMI = ln(c_bg · N_tok² / (N_bg · c1 · c2)), reported in floored
    // micro-nats (the text_entropy/lm_bigram_score precedent: quantize
    // every float term so ordering and hashes are engine-exact; the
    // operands reach ln as identical IEEE doubles via an identical
    // multiply/divide association order on both engines). c_bg >= 5
    // suppresses one-off pairings, the standard PMI noise guard.
    //
    // Scale shape: ONE corpus pass for the two censuses (both
    // map-side-combined hash aggs), two vocabulary-scale equi-joins
    // (AQE picks broadcast vs shuffle as vocab size dictates), a 1-row
    // broadcast of the totals, and a 20-row TakeOrdered. Nothing after
    // the censuses touches corpus-scale data.
    Q("pmi_collocations",
      (s, d) => {
        val toks = Dedup.tokens(docs(s, d)).persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r19 sweep): the bigram census and the unigram
        // census both consume this persist inside one action
        toks.count()
        val bc = toks.filter(size(col("t")) >= 2)
          .select(explode(expr(PipelineOps.bigramStructsExpr)).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bg"))
        val uni = toks.select(explode(col("t")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c_uni"))
        val tot = bc.agg(sum(col("c_bg")).as("nb"))
          .crossJoin(uni.agg(sum(col("c_uni")).as("nt")))
        bc.filter(col("c_bg") >= 5)
          .join(uni.select(col("w").as("w1"), col("c_uni").as("c1")), "w1")
          .join(uni.select(col("w").as("w2"), col("c_uni").as("c2")), "w2")
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("c_bg"),
            floor(log(
              col("c_bg").cast("double") * col("nt").cast("double")
                * col("nt").cast("double")
                / (col("nb").cast("double") * col("c1").cast("double")
                   * col("c2").cast("double"))) * 1e6)
              .cast("long").as("pmi_micro"))
          .orderBy(col("pmi_micro").desc, col("w1"), col("w2")).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("pmi_micro").desc, col("w1"), col("w2")))
            .cast("long"))
      },
      Some("""WITH toks AS (SELECT regexp_extract_all(lower(text), '\S+') AS t
                            FROM documents),
              bg AS (SELECT unnest(t[1:len(t)-1]) AS w1,
                            unnest(t[2:len(t)]) AS w2
                     FROM toks WHERE len(t) >= 2),
              bc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY w1, w2),
              occ AS (SELECT unnest(t) AS w FROM toks),
              uni AS (SELECT w, count(*) AS c_uni FROM occ GROUP BY w),
              tot AS (SELECT (SELECT sum(c_bg) FROM bc) AS nb,
                             (SELECT sum(c_uni) FROM uni) AS nt),
              sc AS (SELECT w1, w2, c_bg,
                            CAST(floor(ln(
                              CAST(c_bg AS DOUBLE) * CAST(nt AS DOUBLE)
                                * CAST(nt AS DOUBLE)
                              / (CAST(nb AS DOUBLE) * CAST(c1 AS DOUBLE)
                                 * CAST(c2 AS DOUBLE))) * 1000000)
                              AS BIGINT) AS pmi_micro
                     FROM bc
                     JOIN (SELECT w AS w1, c_uni AS c1 FROM uni) u1 USING (w1)
                     JOIN (SELECT w AS w2, c_uni AS c2 FROM uni) u2 USING (w2)
                     CROSS JOIN tot
                     WHERE c_bg >= 5)
              SELECT w1, w2, c_bg, pmi_micro,
                     CAST(row_number() OVER (ORDER BY pmi_micro DESC, w1, w2)
                       AS BIGINT) AS rank
              FROM sc ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""")),

    // Cross-source contamination matrix — for every pair of sources,
    // the number of DISTINCT 8-token blocks both contain (the corpus
    // diagnostic behind per-source dedup/mixing decisions: which feeds
    // overlap, and how much). Shape: block digests are a map-only
    // bounded explode; ONE hash agg per digest collects the <=|sources|
    // set (collect_set dedups within the aggregate — no separate
    // distinct exchange); pair expansion is an array HOF over that
    // tiny sorted set, so the quadratic is in SOURCES (20 here, maybe
    // hundreds in production), never in documents or blocks. The DuckDB
    // twin uses the classic digest self-join formulation — an
    // independent derivation, not a mirror.
    Q("source_overlap",
      (s, d) => {
        val blk = docs(s, d)
          .select(col("source"), Dedup.tokenArr(col("text")).as("t"))
          .select(col("source"), explode(expr(
            // a 0-token doc has NO blocks: sequence(1, 0, 8) is an
            // ERROR in Spark (DuckDB's generate_series yields empty),
            // so guard the degenerate bound to the typed empty list
            """transform(
                 CASE WHEN size(t) >= 1 THEN sequence(1, size(t), 8)
                      ELSE CAST(array() AS ARRAY<INT>) END,
                 st -> md5(array_join(slice(t, st, 8), ' ')))""")).as("h"))
        blk.groupBy(col("h"))
          .agg(sort_array(collect_set(col("source"))).as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(explode(expr(
            """flatten(transform(ss,
                 (a, i) -> transform(slice(ss, i + 2, size(ss)),
                                     b -> struct(a AS src_a, b AS src_b))))"""))
            .as("p"))
          .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
          .agg(count(lit(1)).as("n_shared_blocks"))
      },
      Some("""WITH toks AS (SELECT doc_id, source,
                      regexp_extract_all(lower(text), '\S+') AS t
                    FROM documents),
              blk AS (SELECT source,
                             md5(array_to_string(t[st:st+7], ' ')) AS h
                      FROM (SELECT source, t,
                                   unnest(range(1, len(t) + 1, 8)) AS st
                            FROM toks)),
              sb AS (SELECT DISTINCT source, h FROM blk)
              SELECT a.source AS src_a, b.source AS src_b,
                     CAST(count(*) AS BIGINT) AS n_shared_blocks
              FROM sb a JOIN sb b ON a.h = b.h AND a.source < b.source
              GROUP BY a.source, b.source""")),

    // Character-entropy quality scoring — the random/garbage-text
    // detector (low entropy = repeated filler, high = encrypted/binary
    // junk). Reported as n·H in floored micro-nats: every per-character
    // term c·⌊10⁶·ln(n/c)⌋ is quantized BEFORE the sum, so the per-doc
    // total is order-independent integer arithmetic — the only float op
    // is ln over an identical IEEE double (the lm_bigram_score
    // precedent, validated strict-green). Shape: one (doc_id, char)
    // hash agg (≤ ~96 rows per doc survive the map-side combine), one
    // doc_id agg — no windows, no joins against data-scale relations.
    Q("text_entropy",
      (s, d) => {
        val cc = docs(s, d)
          .select(col("doc_id"),
            explode(regexp_extract_all(lower(col("text")),
              lit(s"[^${TextOps.WsChars}]"), lit(0))).as("ch"))
          .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
        val tot = cc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
        cc.join(tot, "doc_id")
          .select(col("doc_id"), col("n"),
            (col("c") * floor(log(col("n").cast("double") / col("c").cast("double")) * 1e6)
              .cast("long")).as("term"))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_chars"), sum(col("term")).as("ent_micro_n"))
      },
      Some("""WITH ch AS (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\S')) AS ch
                   FROM documents),
              cc AS (SELECT doc_id, ch, count(*) AS c
                     FROM ch GROUP BY doc_id, ch),
              tot AS (SELECT doc_id, sum(c) AS n FROM cc GROUP BY doc_id)
              SELECT cc.doc_id, CAST(max(n) AS BIGINT) AS n_chars,
                     CAST(sum(c * CAST(floor(ln(CAST(n AS DOUBLE) /
                                                CAST(c AS DOUBLE)) * 1000000)
                                       AS BIGINT)) AS BIGINT) AS ent_micro_n
              FROM cc JOIN tot USING (doc_id) GROUP BY cc.doc_id""")),

    // N-gram novelty scoring — the memorization/duplication-risk signal
    // (RefinedWeb-style): for every document with >= 8 tokens, the
    // per-mille fraction of its 8-gram POSITIONS whose gram occurs in
    // no other document. Grams are 8-byte xxhash64 longs of the token
    // 8-TUPLE (Dedup.ngramHashArrExpr — the hashed-shingle precedent:
    // the ~60-byte joined window string is never allocated, and both
    // corpus-gram-scale shuffles below move longs instead of 32-char
    // md5 hex strings, the documented ~4-5x shuffle-byte win); "shared"
    // means >= 2 DISTINCT documents contain the gram. Tokens contain no
    // whitespace, so hashing the tuple is injective on windows up to a
    // 64-bit collision (birthday ~1e-8 at 1e5 grams, and deterministic
    // — the oracle count gate would surface one); the DuckDB twin keys
    // on the joined window STRING, which is equality-equivalent, since
    // the output exposes only counts, never the key. Shape: a bounded
    // per-doc explode, one distinct-(doc,h) pass feeding one gram
    // census (both map-side combined), one join back, one doc agg —
    // every shuffle keyed on the long gram or doc_id. Integer per-mille
    // output, engine-exact.
    Q("ngram_novelty",
      (s, d) => {
        // short-doc guard as a CASE inside the exploded array, NOT a
        // .filter(size(t) >= 8): the filter's alias substitution lands
        // size(regexp_extract_all(...)) as a scan-side DataFilter
        // INSIDE the persist's cached build, re-running the corpus
        // tokenize at file parallelism below the fan-out exchange
        // (verified in the executed cached plan, r20 — the same r19
        // pushdown-substitution class; idiom at Dedup.ngramHashes)
        val g = Dedup.tokens(docs(s, d))
          .select(col("doc_id"), explode(expr(
            s"CASE WHEN size(t) >= 8 THEN ${Dedup.ngramHashArrExpr(8)} " +
              "ELSE CAST(array() AS ARRAY<BIGINT>) END")).as("h"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r18): two consumers (census + join-back) of one
        // persist in one action — same cache-fill race as decontaminate
        // (r17 driver: alloc 2.9x committed), same fix (see the
        // decontaminate comment in Dedup.scala for the adjudication)
        g.count()
        val census = g.select(col("doc_id"), col("h")).distinct()
          .groupBy(col("h")).agg(count(lit(1)).as("nd"))
        g.join(census, Seq("h"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            count(when(col("nd") >= 2, 1)).as("n_shared"))
          .select(col("doc_id"), col("n_grams"), col("n_shared"),
            expr("1000 * (n_grams - n_shared) div n_grams").as("novelty_permille"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '\S+') AS t
                    FROM documents),
              g AS (SELECT doc_id,
                           array_to_string(t[i:i+7], ' ') AS h
                    FROM (SELECT doc_id, t,
                                 unnest(range(1, len(t) - 6)) AS i
                          FROM toks WHERE len(t) >= 8)),
              census AS (SELECT h, count(*) AS nd
                         FROM (SELECT DISTINCT doc_id, h FROM g)
                         GROUP BY h),
              agg AS (SELECT doc_id, count(*) AS n_grams,
                             count(*) FILTER (nd >= 2) AS n_shared
                      FROM g JOIN census USING (h) GROUP BY doc_id)
              SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                     CAST(n_shared AS BIGINT) AS n_shared,
                     CAST(1000 * (n_grams - n_shared) // n_grams AS BIGINT)
                       AS novelty_permille
              FROM agg"""))
  )
}
