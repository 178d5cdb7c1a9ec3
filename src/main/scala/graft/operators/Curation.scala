package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Capstone training-data curation pipeline: the individual operators
  * composed the way a real 100 TB corpus build chains them —
  *
  *   quality filter → exact dedup (keep lowest id, count copies)
  *   → TF-IDF top term per surviving document
  *
  * One declarative plan end to end: Catalyst fuses the filter into the
  * scan, the dedup is one hash shuffle on text, the term stats are
  * vocabulary-sized, and nothing touches the driver. Runs over the
  * planted-duplicate corpus so the dedup stage provably collapses pairs.
  */
object Curation extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("pipeline_curation",
      (s, d) => {
        val kept = Dedup.corpus(s, d)
          .where(TextOps.qualityKeep(col("text")))
        // persisted: three consumers (term stats, doc count, final join) —
        // Spark has no cross-branch CSE
        val deduped = kept.groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val top = TextOps.topTerms(deduped, 1)
          .select(col("doc_id"), col("term").as("top_term"),
            col("score").as("top_score"))
        deduped.select(col("doc_id"), col("n_copies")).join(top, "doc_id")
      },
      Some(s"""WITH ${Dedup.corpusSql},
              q AS (SELECT doc_id, text FROM corpus
                    WHERE len(regexp_extract_all(text, '\\S+')) >= 20
                      AND length(regexp_replace(text, '\\s', '', 'g'))
                          / nullif(len(regexp_extract_all(text, '\\S+')), 0)
                          BETWEEN 2 AND 12),
              ded AS (SELECT min(doc_id) AS doc_id, count(*) AS n_copies, text
                      FROM q GROUP BY text),
              n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM ded),
              terms AS (SELECT doc_id,
                          unnest(regexp_extract_all(text, '[a-z]{4,}')) AS term
                        FROM ded),
              tf AS (SELECT doc_id, term, count(*) AS tf
                     FROM terms GROUP BY doc_id, term),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              ranked AS (SELECT doc_id, tf.term,
                           ${ExactNum.oracleRound4("tf * n_docs / df")} AS score,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY ${ExactNum.oracleRound4("tf * n_docs / df")} DESC,
                               tf.term) AS rk
                         FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
              SELECT d.doc_id, d.n_copies, r.term AS top_term,
                     r.score AS top_score
              FROM ded d JOIN ranked r ON d.doc_id = r.doc_id AND r.rk = 1""")),

    // Full corpus-build capstone over the NEAR-dup path: Jaccard pair
    // edges → connected components → keeper per cluster → token-length
    // floor → per-language stratified quota → concat-and-chunk packing.
    // This is the end-to-end shape of a pretraining corpus build; every
    // stage is the operator verified standalone elsewhere
    // (dedup_components, sample_stratified, pack_sequences), composed
    // here so their contracts are exercised AGAINST each other. Keepers
    // are component minima, i.e. original doc_ids for every component
    // that contains its source document; a very short document whose
    // prefix copies miss even the 0.8 threshold leaves orphan copy
    // components (ids ≥ 1M), and the inner documents join drops those —
    // identically in both engines — since only cataloged documents can
    // be packed.
    Q("pipeline_corpus",
      (s, d) => {
        val (corpus, sh, edges) = Components.stagedCorpusEdges(s, d)
        val comp = Components.connectedComponents(
          corpus.select(col("doc_id").as("v")), edges)
        sh.unpersist(blocking = false)
        corpus.unpersist(blocking = false)
        val keepers = comp.select(col("component").as("doc_id")).distinct()
        val kept = Tables.load(s, d, "documents")
          .join(keepers, "doc_id")
          .select(col("doc_id"), col("lang"), col("text"),
            TextOps.wsTokens(col("text")).as("n_tokens"))
          .filter(col("n_tokens") >= 40)
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")), col("doc_id"))
        // persisted: consumed three times (two packSequences windows +
        // the lang join) — keeper-count sized
        val sel = kept.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 50)
          .select(col("doc_id"), col("lang"), col("n_tokens"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        Sampling.packSequences(
            sel.select(col("doc_id"), col("n_tokens")), 2048, 256)
          .join(sel.select(col("doc_id"), col("lang")), "doc_id")
      },
      Some(s"""WITH RECURSIVE ${Components.ccOracleCtes},
               keepers AS (SELECT DISTINCT component AS doc_id FROM comp),
               kd AS (SELECT d.doc_id, d.lang, d.text,
                        len(regexp_extract_all(d.text, '\\S+')) AS n_tokens
                      FROM documents d JOIN keepers USING (doc_id)),
               kf AS (SELECT * FROM kd WHERE n_tokens >= 40),
               strat AS (SELECT doc_id, lang, n_tokens,
                           row_number() OVER (PARTITION BY lang
                             ORDER BY md5(text), doc_id) AS rk
                         FROM kf),
               sel AS (SELECT doc_id, lang, n_tokens FROM strat
                       WHERE rk <= 50),
               o AS (SELECT doc_id, lang, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS off
                     FROM sel)
               SELECT doc_id, n_tokens,
                      CAST(off // 2048 AS BIGINT) AS first_chunk,
                      CAST((off + n_tokens - 1) // 2048 AS BIGINT) AS last_chunk, lang
               FROM o"""))
  )
}
