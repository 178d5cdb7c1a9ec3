package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-statistics pipeline ops beyond the dedup/similarity families:
  * vocabulary building, hashed-feature quality classification, n-gram
  * LM scoring (the CCNet-style perplexity filter shape), passage-level
  * dedup, and overlapping context-window chunking.
  *
  * These extend the reference's text surface (tinysql has none —
  * `expression/builtin_string.go` stops at LENGTH/STRCMP) with the
  * standard pretraining-corpus stages; each is expressed as declarative
  * DataFrame shapes (explode → hash-agg → hash-join) so Catalyst keeps
  * the whole path in whole-stage codegen and AQE picks broadcast sides.
  *
  * Scale posture (100 TB corpus):
  *   - Every stage shuffles on a bounded key (token, bigram, block
  *     hash, doc_id) — never all-pairs, never a driver collect of
  *     data-scale rows.
  *   - Model-side relations (vocabulary, bigram counts, dup-block set)
  *     are sublinear in the corpus and join back via AQE broadcast or a
  *     medium hash join; the corpus-scale side makes exactly one pass.
  *   - Per-doc explodes fan out AFTER a doc_id repartition
  *     ([[Dedup.tokens]]), so tokenize cost rides 32 partitions, not
  *     file parallelism.
  */
object PipelineOps extends QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Adjacent-bigram structs over a token-array column `t` — shared by
    * the batch LM scorer and the streaming ingest filter
    * ([[graft.streaming.DedupStream.lmQualityFilter]]) so the bigram
    * definition cannot drift. Callers guard `size(t) >= 2` (sequence's
    * inferred step would walk backwards on shorter arrays).
    */
  private[graft] val bigramStructsExpr: String =
    """transform(sequence(1, size(t) - 1),
       i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"""

  /** Per-token hashed-feature weight w[xxhash64(tok) & 255] − 128 —
    * shared by the batch classifier and the streaming filter.
    */
  private[graft] def tokenWeight(tok: Column): Column =
    xxhash64(tok).bitwiseAND(lit(255L)) - 128

  override val queries: Seq[Q] = Seq(

    // Vocabulary building — the tokenizer-training precursor: global
    // token counts, top-K by frequency with a deterministic token-order
    // tie-break. Scale shape: one hash agg on token (map-side partial
    // combine ⇒ at most |vocab| rows per partition cross the wire),
    // then TakeOrderedAndProject for the top-K — the global sort never
    // materializes, and the K-row result is metadata-scale, so the
    // final rank window over it is a 100-row single partition by
    // construction, not a scaling hazard.
    Q("vocab_topk",
      (s, d) => {
        val occ = Dedup.tokens(docs(s, d)).select(explode(col("t")).as("tok"))
        val counts = occ.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        counts.orderBy(col("cnt").desc, col("tok")).limit(100)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      },
      Some("""WITH occ AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
                           FROM documents),
              c AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
              r AS (SELECT tok, cnt,
                           row_number() OVER (ORDER BY cnt DESC, tok) AS rank
                    FROM c)
              SELECT tok, cnt, rank FROM r WHERE rank <= 100""")),

    // Hashed-feature linear quality classifier — the fastText-style
    // filter: score(doc) = Σ_tokens w[h(token) mod 256] with a fixed
    // deterministic weight table w[i] = i − 128. Pure integer
    // arithmetic end-to-end (bit-exact across engines by construction).
    // Scale shape: map-only scoring per occurrence + ONE doc_id hash
    // agg; the "model" is the hash function itself, so nothing joins.
    // The DuckDB twin replays Spark's xxhash64 via the generated
    // XXH64 CTE chain ([[XxHash64Sql]] — ASCII <32-byte tokens, which
    // PipelineOpsSpec asserts for this corpus); `h % 256` on the
    // unsigned oracle hash equals the signed Spark hash's low byte.
    Q("quality_classifier",
      (s, d) => {
        val occ = Dedup.tokens(docs(s, d))
          .select(col("doc_id"), explode(col("t")).as("t"))
        occ
          .select(col("doc_id"), tokenWeight(col("t")).as("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
          .select(col("doc_id"), col("n_tokens"), col("score"),
            (col("score") >= 0).as("keep"))
      },
      Some(s"""WITH occ AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\S+')) AS t
                     FROM documents),
               v AS (SELECT DISTINCT t FROM occ),
               ${XxHash64Sql.ctes},
               w AS (SELECT t, CAST(h % 256 AS BIGINT) - 128 AS w
                     FROM ${XxHash64Sql.last}),
               sc AS (SELECT occ.doc_id, count(*) AS n_tokens,
                             sum(w.w) AS score
                      FROM occ JOIN w USING (t) GROUP BY occ.doc_id)
               SELECT doc_id, n_tokens, CAST(score AS BIGINT) AS score,
                      score >= 0 AS keep
               FROM sc""")),

    // Bigram-LM corpus scoring — the perplexity-filter shape (CCNet /
    // Gopher): train add-one-smoothed bigram counts on the corpus
    // itself, then score every document by its total bigram log-prob
    // logp = Σ ln((c2(w1,w2)+1) / (c1(w1)+V)). Each term is quantized
    // to an integer (floor(ln·10⁶)) BEFORE summing, so the per-doc sum
    // is order-independent exact integer arithmetic — the only
    // cross-engine float op is ln over an identical IEEE double.
    //
    // Scale shape: unigram + bigram counts are two hash aggs with
    // map-side combine (model size = |vocab| + |bigram vocab|, both
    // sublinear in corpus tokens); scoring joins the corpus bigram
    // stream once against each count relation (AQE broadcasts them
    // while they fit, plain shuffle hash join beyond that); V is a
    // 1-row broadcast. One doc_id agg finishes. No per-doc state, no
    // driver loops — the same plan at 1000 executors just has wider
    // exchanges.
    Q("lm_bigram_score",
      (s, d) => {
        val toks = Dedup.tokens(docs(s, d))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // eager breaker (r19 sweep, the minhash `buckets` mechanism):
        // the unigram census and the bigram explode both consume this
        // persist inside one action — unbreakered, their tasks race
        // the cache fill and each recompute the corpus tokenize
        toks.count()
        val occ = toks.select(col("doc_id"), explode(col("t")).as("w"))
        val uni = occ.groupBy(col("w")).agg(count(lit(1)).as("c1"))
        val vocabN = uni.agg(count(lit(1)).as("v"))
        val bg = toks.filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(bigramStructsExpr)).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        val terms = bg
          .join(big, Seq("w1", "w2"))
          .join(uni, bg("w1") === uni("w"))
          .crossJoin(broadcast(vocabN))
          .select(col("doc_id"),
            floor(log((col("c2") + 1).cast("double") /
                      (col("c1") + col("v")).cast("double")) * 1e6)
              .cast("long").as("q"))
        val sc = terms.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("s"))
        toks.select(col("doc_id")).join(sc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("s"), lit(0L)).as("logp_micro"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '\S+') AS t
                    FROM documents),
              occ AS (SELECT doc_id, unnest(t) AS w FROM toks),
              uni AS (SELECT w, count(*) AS c1 FROM occ GROUP BY w),
              vocab AS (SELECT count(*) AS v FROM uni),
              bg AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,
                            unnest(t[2:len(t)]) AS w2
                     FROM toks WHERE len(t) >= 2),
              big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
              terms AS (SELECT doc_id,
                          CAST(floor(ln(CAST(c2 + 1 AS DOUBLE) /
                                        CAST(c1 + v AS DOUBLE)) * 1000000)
                               AS BIGINT) AS q
                        FROM bg JOIN big USING (w1, w2)
                        JOIN uni ON bg.w1 = uni.w CROSS JOIN vocab),
              sc AS (SELECT doc_id, count(*) AS n_bigrams, sum(q) AS s
                     FROM terms GROUP BY doc_id)
              SELECT d.doc_id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                     CAST(coalesce(s, 0) AS BIGINT) AS logp_micro
              FROM documents d LEFT JOIN sc USING (doc_id)""")),

    // Passage-level dedup — the C4/RefinedWeb line-dedup analog for a
    // corpus without newlines: split every document into aligned
    // 8-token blocks, drop every block whose exact text occurs ≥ 2
    // times ANYWHERE in the corpus, and reassemble the cleaned
    // document. Planted signal: the corpus is documents ∪ a 16-token
    // excerpt of every doc_id % 5 == 0 document (+2,000,000 id space),
    // so those docs' first two blocks are duplicated by construction
    // (the synthetic corpus also contains natural repeats — both
    // engines see the same ones).
    //
    // Scale shape: blocks are bounded fan-out (⌈tokens/8⌉ per doc);
    // the dup-block set is ONE hash agg on the 16-byte md5 (map-side
    // combine), rejoined once (AQE broadcast while it fits). Document
    // reassembly groups each doc's own ≤⌈len/8⌉ blocks — per-key state
    // is bounded by max document length, never corpus size.
    Q("dedup_passage",
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), lower(col("text")).as("text"))
        val pcorp = base.unionAll(
          base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              array_join(slice(Dedup.tokenArr(col("text")), 1, 16), " ")
                .as("text")))
        // the one shared tokenize-staging definition (lower() inside
        // tokenArr is idempotent on the pre-lowercased pcorp)
        val toks = Dedup.tokens(pcorp)
        val blk = toks
          .select(col("doc_id"), explode(expr(
            // 0-token docs have no blocks; sequence(1, 0, 8) errors
            // (the DuckDB twin's generate_series yields empty)
            """transform(
                 CASE WHEN size(t) >= 1 THEN sequence(1, size(t), 8)
                      ELSE CAST(array() AS ARRAY<INT>) END,
               s -> struct(CAST((s - 1) div 8 AS BIGINT) AS idx,
                           array_join(slice(t, s, 8), ' ') AS btext))"""))
            .as("b"))
          .select(col("doc_id"), col("b.idx").as("idx"),
            col("b.btext").as("btext"), md5(col("b.btext")).as("h"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val dup = blk.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select(col("h"), lit(true).as("is_dup"))
        blk.join(dup, Seq("h"), "left")
          .select(col("doc_id"), col("idx"), col("btext"),
            coalesce(col("is_dup"), lit(false)).as("is_dup"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_blocks"),
            count(when(col("is_dup"), 1)).as("n_dup_blocks"),
            array_join(
              transform(
                array_sort(collect_list(
                  when(!col("is_dup"), struct(col("idx"), col("btext"))))),
                _.getField("btext")),
              " ").as("clean_text"))
      },
      Some("""WITH pcorp AS (
                SELECT doc_id, lower(text) AS text FROM documents
                UNION ALL
                SELECT doc_id + 2000000,
                       array_to_string(list_slice(
                         regexp_extract_all(lower(text), '\S+'), 1, 16), ' ')
                FROM documents WHERE doc_id % 5 = 0),
              toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                       FROM pcorp),
              blk AS (SELECT doc_id, CAST((s - 1) // 8 AS BIGINT) AS idx,
                             array_to_string(t[s:s+7], ' ') AS btext
                      FROM (SELECT doc_id, t,
                                   unnest(range(1, len(t) + 1, 8)) AS s
                            FROM toks)),
              bh AS (SELECT doc_id, idx, btext, md5(btext) AS h FROM blk),
              dup AS (SELECT h FROM bh GROUP BY h HAVING count(*) >= 2),
              fl AS (SELECT bh.doc_id, bh.idx, bh.btext,
                            dup.h IS NOT NULL AS is_dup
                     FROM bh LEFT JOIN dup ON bh.h = dup.h)
              SELECT doc_id, count(*) AS n_blocks,
                     CAST(count(*) FILTER (is_dup) AS BIGINT) AS n_dup_blocks,
                     coalesce(string_agg(btext, ' ' ORDER BY idx)
                              FILTER (NOT is_dup), '') AS clean_text
              FROM fl GROUP BY doc_id""")),

    // Overlapping context-window chunking — the training-example cut:
    // windows of 32 tokens at stride 24 (8-token overlap carries
    // context across boundaries). Emits (doc_id, chunk_idx, start_pos,
    // n_tokens, chunk_md5); the md5 stands in for the chunk payload so
    // the oracle compares identity without shipping chunk text.
    // Map-only: one narrow projection + bounded explode per document,
    // no shuffle at all — the ideal 100 TB shape (cost is exactly one
    // corpus pass; output feeds shuffle_shard / pack_sequences).
    Q("chunk_overlap",
      (s, d) => Dedup.tokens(docs(s, d))
        .select(col("doc_id"), explode(expr(
          // 0-token docs have no chunks; sequence(1, 0, 24) errors
          """transform(
               CASE WHEN size(t) >= 1 THEN sequence(1, size(t), 24)
                    ELSE CAST(array() AS ARRAY<INT>) END,
             s -> struct(CAST((s - 1) div 24 AS BIGINT) AS chunk_idx,
                         CAST(s AS BIGINT) AS start_pos,
                         CAST(size(slice(t, s, 32)) AS BIGINT) AS n_tokens,
                         md5(array_join(slice(t, s, 32), ' ')) AS chunk_md5))"""))
          .as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          col("c.start_pos").as("start_pos"), col("c.n_tokens").as("n_tokens"),
          col("c.chunk_md5").as("chunk_md5")),
      Some("""WITH toks AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '\S+') AS t
                    FROM documents),
              st AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s
                     FROM toks)
              SELECT doc_id, CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
                     CAST(s AS BIGINT) AS start_pos,
                     CAST(len(t[s:s+31]) AS BIGINT) AS n_tokens,
                     md5(array_to_string(t[s:s+31], ' ')) AS chunk_md5
              FROM st"""))
  )
}
