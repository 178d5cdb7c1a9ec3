package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 pipeline operators (the DuckDB
  * oracle is the equivalence gate; these pin the properties the oracle
  * can't express as a hash compare).
  */
class PipelineOpsSpec extends SparkSuite {

  test("join_asof: every purchase row points at a prior-or-equal click") {
    val df = q("join_asof").cache()
    assert(df.count() > 0)
    // as-of contract: the matched click is at or before the purchase
    assert(df.filter(col("click_us") > col("purchase_us")).count() == 0)
    // one output row per qualifying purchase
    val n = df.count()
    assert(df.select("purchase_id").distinct().count() == n)
    df.unpersist()
  }

  test("join_asof picks the LATEST eligible click, not just any") {
    // cross-check one user end-to-end against a direct computation
    val ev = Tables.loadEvents(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val u = ev.where(col("event_type") === "purchase")
      .select("user_id").limit(1).collect()(0).getLong(0)
    val clicks = ev.where(col("user_id") === u &&
      col("event_type") === "click").collect().map(r => (r.getLong(0), r.getLong(2)))
    val out = q("join_asof").where(col("user_id") === u).collect()
    out.foreach { r =>
      val pUs = r.getLong(2)
      val eligible = clicks.filter(_._2 <= pUs)
      if (eligible.nonEmpty) {
        val best = eligible.maxBy(c => (c._2, c._1))
        assert(r.getLong(3) == best._1,
          s"purchase at $pUs matched click ${r.getLong(3)}, expected ${best._1}")
      }
    }
  }

  test("text_pii_scrub: no planted PII survives, every redaction counted") {
    val df = q("text_pii_scrub").cache()
    assert(df.filter(col("scrubbed").rlike(
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).count() == 0)
    assert(df.filter(col("scrubbed").rlike("\\b555-[0-9]{4}\\b")).count() == 0)
    // every doc had exactly one of each planted
    assert(df.filter(col("n_emails") < 1 || col("n_phones") < 1 ||
      col("n_ips") < 1).count() == 0)
    assert(df.filter(!col("scrubbed").contains("<EMAIL>") ||
      !col("scrubbed").contains("<PHONE>") ||
      !col("scrubbed").contains("<IP>")).count() == 0)
    df.unpersist()
  }

  test("text_repetition ratios are consistent for a sampled doc") {
    val row = q("text_repetition").orderBy("doc_id").limit(1).collect()(0)
    val docId = row.getLong(0)
    val toks = Tables.load(spark, sf, "documents")
      .where(col("doc_id") === docId).select(lower(col("text"))).collect()(0)
      .getString(0).split("[^a-z0-9]+").filter(_.nonEmpty)
    val n = toks.length.toDouble
    val counts = toks.groupBy(identity).view.mapValues(_.length)
    // Spark's round() on DOUBLE is HALF_UP — mirror it exactly
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(1) == r4(1 - counts.size / n))
    assert(row.getDouble(2) == r4(counts.values.max / n))
    // ratios live in [0, 1]
    val df = q("text_repetition")
    assert(df.filter(col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
      col("top_word_ratio") <= 0 || col("top_word_ratio") > 1 ||
      col("top_bigram_ratio") <= 0 || col("top_bigram_ratio") > 1)
      .count() == 0)
  }

  test("fingerprint expression equals the composed higher-order fold") {
    graft.functions.Fingerprint.register(spark)
    val docs = Tables.load(spark, sf, "documents")
    val mismatch = docs.select(
        graft.functions.Fingerprint.fingerprint(col("text")).as("fast"),
        aggregate(split(col("text"), ""), lit(0L),
          (acc, c) => (acc * 31 + ascii(c)) % 1000000007L).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatch == 0)
    // NULL propagates
    val r = spark.sql("SELECT graft_fingerprint(CAST(NULL AS STRING))")
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
