package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table — training-data-pipeline ops:
  * token counting, quality scoring, language-ID, document fingerprinting.
  * Everything stays inside codegen'd built-ins (regexp_*, higher-order
  * array functions) — no UDFs, so the hot path survives 100 TB.
  */
object TextOps extends QueryModule {

  /** Whitespace-delimited token count. `regexp_count` walks the matches
    * without materializing them — `size(regexp_extract_all(...))` builds
    * an array of every matched substring per row just to take its
    * length, which at corpus scale is an allocation per token.
    */
  def wsTokens(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — the usual byte-level BPE split shape.
    */
  def bpeTokens(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  private def stopCount(text: Column, words: String): Column =
    regexp_count(lower(text), lit(s"\\b($words)\\b"))

  /** The pre-training keep/drop predicate (token count + mean token
    * length band) — shared by text_quality and the curation pipeline.
    */
  def qualityKeep(text: Column): Column = {
    val nTok = wsTokens(text)
    val meanTok = length(regexp_replace(text, "\\s", "")) / nullif(nTok, lit(0))
    nTok >= 20 && meanTok >= 2 && meanTok <= 12
  }

  /** TF × (N/df) top-k terms per document over (doc_id, text) rows —
    * shared by text_tfidf and the curation pipeline; see text_tfidf's
    * note on why the inverse document frequency stays linear (exact
    * rational arithmetic ⇒ bit-exact oracle).
    */
  def topTerms(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val terms = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]{4,}"), lit(0))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(nDocs)
      .select(col("doc_id"), col("term"),
        round(col("tf") * col("n") / col("df"), 4).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the code points —
    * a deterministic document fingerprint. Delegates to the codegen'd
    * [[graft.functions.Fingerprint]] expression (one pass, no per-char
    * array); requires `Fingerprint.register` on the session.
    */
  def fingerprint(text: Column): Column =
    graft.functions.Fingerprint.fingerprint(text)

  override val queries: Seq[Q] = Seq(

    Q("text_token_count",
      (s, d) => Tables.load(s, d, "documents").select(
        col("doc_id"),
        wsTokens(col("text")).as("ws_tokens"),
        bpeTokens(col("text")).as("bpe_tokens")),
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '\S+')) AS ws_tokens,
                     len(regexp_extract_all(lower(text),
                         '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
              FROM documents""")),

    // Quality scoring: length / punctuation / stopword / digit ratios and
    // a keep/drop flag — the standard pre-training filter features.
    Q("text_quality",
      (s, d) => {
        val txt = col("text")
        val nTok = wsTokens(txt)
        val nonSpace = length(regexp_replace(txt, "\\s", ""))
        val stops = stopCount(txt, "the|a|of|to|and|in|is")
        val meanTok = nonSpace / nullif(nTok, lit(0))
        Tables.load(s, d, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          round(meanTok, 4).as("mean_tok_len"),
          round(stops / nullif(nTok, lit(0)), 4).as("stop_ratio"),
          round(regexp_count(txt, lit("[0-9]"))
            / nullif(length(txt), lit(0)), 4).as("digit_ratio"),
          qualityKeep(txt).as("keep"))
      },
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     round(length(regexp_replace(text, '\s', '', 'g'))
                           / nullif(len(regexp_extract_all(text, '\S+')), 0),
                           4) AS mean_tok_len,
                     round(len(regexp_extract_all(lower(text),
                               '\b(the|a|of|to|and|in|is)\b'))
                           / nullif(len(regexp_extract_all(text, '\S+')), 0),
                           4) AS stop_ratio,
                     round(len(regexp_extract_all(text, '[0-9]'))
                           / nullif(length(text), 0), 4) AS digit_ratio,
                     (len(regexp_extract_all(text, '\S+')) >= 20
                      AND length(regexp_replace(text, '\s', '', 'g'))
                          / nullif(len(regexp_extract_all(text, '\S+')), 0)
                          BETWEEN 2 AND 12) AS keep
              FROM documents""")),

    // Language-ID: per-language stopword-hit counts (CJK chars for zh),
    // argmax with fixed precedence; 'und' when nothing matches.
    Q("text_langid",
      (s, d) => {
        val txt = col("text")
        val en = stopCount(txt, "the|and|of|to|in|is|that")
        val de = stopCount(txt, "der|die|und|das|ist|nicht")
        val fr = stopCount(txt, "le|et|les|des|une|est")
        val es = stopCount(txt, "el|y|los|las|por|una")
        val zh = regexp_count(txt, lit("[\\u4e00-\\u9fff]"))
        Tables.load(s, d, "documents")
          .withColumn("en", en).withColumn("de", de).withColumn("fr", fr)
          .withColumn("es", es).withColumn("zh", zh)
          .select(
            col("doc_id"), col("lang").as("true_lang"),
            when(col("en") + col("de") + col("fr") + col("es") + col("zh")
              === 0, "und")
              .when(col("en") >= col("de") && col("en") >= col("fr")
                && col("en") >= col("es") && col("en") >= col("zh"), "en")
              .when(col("de") >= col("fr") && col("de") >= col("es")
                && col("de") >= col("zh"), "de")
              .when(col("fr") >= col("es") && col("fr") >= col("zh"), "fr")
              .when(col("es") >= col("zh"), "es")
              .otherwise("zh").as("pred_lang"))
      },
      Some("""WITH c AS (
                SELECT doc_id, lang,
                  len(regexp_extract_all(lower(text),
                      '\b(the|and|of|to|in|is|that)\b')) AS en,
                  len(regexp_extract_all(lower(text),
                      '\b(der|die|und|das|ist|nicht)\b')) AS de,
                  len(regexp_extract_all(lower(text),
                      '\b(le|et|les|des|une|est)\b')) AS fr,
                  len(regexp_extract_all(lower(text),
                      '\b(el|y|los|las|por|una)\b')) AS es,
                  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh
                FROM documents)
              SELECT doc_id, lang AS true_lang,
                     CASE WHEN en + de + fr + es + zh = 0 THEN 'und'
                          WHEN en >= de AND en >= fr AND en >= es AND en >= zh
                            THEN 'en'
                          WHEN de >= fr AND de >= es AND de >= zh THEN 'de'
                          WHEN fr >= es AND fr >= zh THEN 'fr'
                          WHEN es >= zh THEN 'es'
                          ELSE 'zh' END AS pred_lang
              FROM c""")),

    Q("text_fingerprint",
      (s, d) => {
        graft.functions.Fingerprint.register(s)
        Tables.load(s, d, "documents").select(
          col("doc_id"), fingerprint(col("text")).as("fp"))
      },
      Some("""SELECT doc_id,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(text, ''),
                                        c -> CAST(ascii(c) AS BIGINT))),
                       (a, b) -> (a * 31 + b) % 1000000007) AS fp
              FROM documents""")),

    // TF-IDF-style term weighting: tf × (N / df), top-3 terms per doc.
    // Linear inverse document frequency keeps the score exact rational
    // arithmetic so the DuckDB oracle hash-matches bit-for-bit; the
    // classic log-idf is a one-expression swap (ln(N/df)) whose libm
    // rounding Spark and DuckDB do not contractually share. Shape:
    // tokenize → per-(doc,term) tf (one shuffle) → per-term df (one
    // shuffle, map-combined) → broadcast-size join → per-doc top-k
    // window. At 100 TB the df table is vocabulary-sized, not
    // corpus-sized, and everything is hash-partitioned.
    Q("text_tfidf",
      (s, d) => topTerms(Tables.load(s, d, "documents"), 3)
        .select(col("doc_id"), col("term"), col("score"),
          col("rk").cast("int").as("rank")),
      Some("""WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs
                         FROM documents),
              terms AS (SELECT doc_id,
                          unnest(regexp_extract_all(lower(text), '[a-z]{4,}'))
                            AS term
                        FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf
                     FROM terms GROUP BY doc_id, term),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              scored AS (SELECT doc_id, tf.term,
                           round(tf * n_docs / df, 4) AS score
                         FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
              ranked AS (SELECT doc_id, term, score,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, term) AS rank
                         FROM scored)
              SELECT doc_id, term, score, CAST(rank AS INT) AS rank
              FROM ranked WHERE rank <= 3"""))
  )
}
