package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table — training-data-pipeline ops:
  * token counting, quality scoring, language-ID, document fingerprinting.
  * Everything stays inside codegen'd built-ins (regexp_*, higher-order
  * array functions) — no UDFs, so the hot path survives 100 TB.
  */
object TextOps extends QueryModule {

  /** RE2-aligned ASCII whitespace, as a regex-source fragment. Java's
    * `\s` is `[ \t\n\x0B\f\r]` but RE2's (DuckDB's) is `[\t\n\f\r ]` —
    * vertical tab is the one disagreement, and an implicit `\s`/`\S` on
    * the Spark side silently forks every token count, shingle set, and
    * quality ratio from the oracle the moment real crawl text carries a
    * VT. Every Spark-side tokenizer/whitespace regex in the repo spells
    * the class out from these fragments instead (the oracle SQL keeps
    * plain `\s`, which RE2 already reads as exactly this set);
    * DedupSpec pins the VT behavior.
    */
  private[graft] val WsChars = " \\t\\n\\f\\r"

  /** `\S+` with RE2 semantics (VT is a token character). */
  private[graft] val NonWsToken = s"[^$WsChars]+"

  /** Whitespace-delimited token count. `regexp_count` walks the matches
    * without materializing them — `size(regexp_extract_all(...))` builds
    * an array of every matched substring per row just to take its
    * length, which at corpus scale is an allocation per token.
    */
  def wsTokens(text: Column): Column = regexp_count(text, lit(NonWsToken))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — the usual byte-level BPE split shape.
    */
  def bpeTokens(text: Column): Column =
    regexp_count(lower(text), lit(s"[a-z]+|[0-9]+|[^a-z0-9$WsChars]"))

  private def stopCount(text: Column, words: String): Column =
    regexp_count(lower(text), lit(s"\\b($words)\\b"))

  /** The pre-training keep/drop predicate (token count + mean token
    * length band) — shared by text_quality and the curation pipeline.
    */
  def qualityKeep(text: Column): Column = {
    val nTok = wsTokens(text)
    val meanTok =
      length(regexp_replace(text, s"[$WsChars]", "")) / nullif(nTok, lit(0))
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
        ExactNum.round4(col("tf") * col("n") / col("df")).as("score"))
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
        val nonSpace = length(regexp_replace(txt, s"[$WsChars]", ""))
        val stops = stopCount(txt, "the|a|of|to|and|in|is")
        val meanTok = nonSpace / nullif(nTok, lit(0))
        Tables.load(s, d, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          ExactNum.round4(meanTok).as("mean_tok_len"),
          ExactNum.round4(stops / nullif(nTok, lit(0))).as("stop_ratio"),
          ExactNum.round4(regexp_count(txt, lit("[0-9]"))
            / nullif(length(txt), lit(0))).as("digit_ratio"),
          qualityKeep(txt).as("keep"))
      },
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     (round((length(regexp_replace(text, '\s', '', 'g'))
                           / nullif(len(regexp_extract_all(text, '\S+')), 0))
                           * 10000) / 10000.0) AS mean_tok_len,
                     (round((len(regexp_extract_all(lower(text),
                               '\b(the|a|of|to|and|in|is)\b'))
                           / nullif(len(regexp_extract_all(text, '\S+')), 0))
                           * 10000) / 10000.0) AS stop_ratio,
                     (round((len(regexp_extract_all(text, '[0-9]'))
                           / nullif(length(text), 0)) * 10000) / 10000.0)
                       AS digit_ratio,
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
            // coalesce: NULL text makes every count NULL, and a NULL
            // sum fails every comparison below — without it a
            // failed-fetch doc fell through the whole chain to the
            // `otherwise` and was confidently labeled zh in BOTH
            // engines (agreeing, so the parity gate could never catch
            // it). No evidence = 'und'.
            when(coalesce(
              col("en") + col("de") + col("fr") + col("es") + col("zh"),
              lit(0)) === 0, "und")
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
                     CASE WHEN coalesce(en + de + fr + es + zh, 0) = 0
                            THEN 'und'
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

    // PII scrubbing: redact emails / phone numbers / IPv4 addresses with
    // typed placeholders and count what was removed — the standard
    // pre-training privacy pass. The synthetic corpus contains no PII,
    // so the query first plants deterministic doc_id-derived PII into
    // each document (both engines build the identical augmented text);
    // the scrub itself is three codegen'd regexp_replace passes — one
    // scan, no shuffle, embarrassingly parallel at any scale. Patterns
    // stay in the Java∩RE2 regex subset so Spark and DuckDB agree.
    Q("text_pii_scrub",
      (s, d) => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phoneRe = "\\b555-[0-9]{4}\\b"
        val ipRe = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        // % (sign-of-dividend), not pmod: the oracle plants with
        // DuckDB's %, which agrees with Spark's % on every sign while
        // pmod(-3, 10000) = 9997 would plant a DIFFERENT phone/IP
        // string for a negative doc_id — the silent-fork pattern the
        // oracle conventions exist to prevent (identical for the
        // fixture's non-negative ids)
        val planted = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example.com tel 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), col("doc_id") % 256, lit(".7"))
        Tables.load(s, d, "documents")
          .select(col("doc_id"), planted.as("t"))
          .select(col("doc_id"),
            regexp_replace(regexp_replace(regexp_replace(col("t"),
              emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")
              .as("scrubbed"),
            regexp_count(col("t"), lit(emailRe)).as("n_emails"),
            regexp_count(col("t"), lit(phoneRe)).as("n_phones"),
            regexp_count(col("t"), lit(ipRe)).as("n_ips"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id ||
                       '@mail.example.com tel 555-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                       ' from 10.0.' || (doc_id % 256) || '.7' AS t
                FROM documents)
              SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(t,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>',
                       'g'), '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
                       '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>',
                       'g') AS scrubbed,
                     len(regexp_extract_all(t,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
                     len(regexp_extract_all(t, '\b555-[0-9]{4}\b'))
                       AS n_phones,
                     len(regexp_extract_all(t,
                       '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips
              FROM p""")),

    // Repetition-based quality (the Gopher repetition filters): repeated
    // word mass, most-frequent-word share, most-frequent-bigram share.
    // All three ratios are functions of ONE document's tokens, so they
    // are computed per-row with array HOFs (sort the doc's token array,
    // fold run lengths for distinct-count and max-multiplicity): a
    // map-ONLY pass — zero shuffles at any corpus size. The r8 form
    // exploded tokens and bigrams through two corpus-token-scale
    // (doc_id, unit) exchanges to compute the same per-doc numbers.
    // State is bounded by one doc's token array, the same per-doc bound
    // every other documents op already carries.
    Q("text_repetition",
      (s, d) => {
        // (top = max run length, nd = distinct count) of a sorted array,
        // as one integer fold; tokens are non-empty so '' is a safe
        // initial prev sentinel.
        def runStats(arr: String) =
          s"""aggregate(array_sort($arr),
                struct('' AS prev, 0L AS run, 0L AS best, 0L AS nd),
                (a, x) -> struct(x AS prev,
                                 if(x = a.prev, a.run + 1, 1L) AS run,
                                 greatest(a.best,
                                   if(x = a.prev, a.run + 1, 1L)) AS best,
                                 a.nd + if(x = a.prev, 0L, 1L) AS nd),
                a -> struct(a.best AS top, a.nd AS nd))"""
        // The short-doc drop is an explode of a CASE-guarded singleton,
        // NOT a `.filter(size(t) >= 2)`: on this unpersisted projection
        // predicate pushdown SUBSTITUTES the filter's alias, landing
        // `size(regexp_extract_all(...))` as a scan-side DataFilter
        // that re-runs the per-row tokenize a second time (the r19
        // pushdown-substitution class — idiom and rationale at
        // Dedup.ngramHashes). Exploding array(t0) keeps exactly one
        // tokenize per row (the two t0 references inside one Generate
        // input are not a collapse target — the CASE sits ABOVE the
        // projection that computes t0, and CollapseProject refuses to
        // inline a non-cheap alias consumed twice); the empty array
        // drops the short docs exactly like the filter did.
        Tables.load(s, d, "documents")
          .select(col("doc_id"),
            regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
              .as("t0"))
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(t0) >= 2 THEN array(t0) " +
              "ELSE CAST(array() AS ARRAY<ARRAY<STRING>>) END")).as("t"))
          .withColumn("bg", expr(
            "transform(sequence(0, size(t)-2), " +
              "i -> concat_ws(' ', t[i], t[i+1]))"))
          .withColumn("ws", expr(runStats("t")))
          .withColumn("bs", expr(runStats("bg")))
          .select(col("doc_id"),
            ExactNum.round4(lit(1) - col("ws.nd") / size(col("t")).cast("long"))
              .as("dup_word_ratio"),
            ExactNum.round4(col("ws.top") / size(col("t")).cast("long"))
              .as("top_word_ratio"),
            ExactNum.round4(col("bs.top") / (size(col("t")).cast("long") - 1))
              .as("top_bigram_ratio"))
      },
      Some("""WITH w AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS u
                FROM documents),
              wc AS (SELECT doc_id, u, count(*) AS c FROM w GROUP BY 1, 2),
              ws AS (SELECT doc_id, sum(c) AS n, count(*) AS n_distinct,
                            max(c) AS top
                     FROM wc GROUP BY doc_id),
              t AS (SELECT doc_id,
                           regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                    FROM documents),
              b AS (SELECT doc_id,
                           unnest(list_transform(range(1, len(t)),
                             i -> t[i] || ' ' || t[i+1])) AS u
                    FROM t WHERE len(t) >= 2),
              bc AS (SELECT doc_id, u, count(*) AS c FROM b GROUP BY 1, 2),
              bs AS (SELECT doc_id, sum(c) AS n2, max(c) AS top2
                     FROM bc GROUP BY doc_id)
              SELECT ws.doc_id,
                     (round((1 - n_distinct / n) * 10000) / 10000.0) AS dup_word_ratio,
                     (round((top / n) * 10000) / 10000.0) AS top_word_ratio,
                     (round((top2 / n2) * 10000) / 10000.0) AS top_bigram_ratio
              FROM ws JOIN bs ON ws.doc_id = bs.doc_id""")),

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
                           (round((tf * n_docs / df) * 10000) / 10000.0) AS score
                         FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
              ranked AS (SELECT doc_id, term, score,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, term) AS rank
                         FROM scored)
              SELECT doc_id, term, score, CAST(rank AS INT) AS rank
              FROM ranked WHERE rank <= 3"""))
  )
}
