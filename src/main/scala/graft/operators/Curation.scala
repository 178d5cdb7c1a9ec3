package graft.operators

import graft.{Q, QueryModule}
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
                           round(tf * n_docs / df, 4) AS score,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY round(tf * n_docs / df, 4) DESC,
                               tf.term) AS rk
                         FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
              SELECT d.doc_id, d.n_copies, r.term AS top_term,
                     r.score AS top_score
              FROM ded d JOIN ranked r ON d.doc_id = r.doc_id AND r.rk = 1"""))
  )
}
