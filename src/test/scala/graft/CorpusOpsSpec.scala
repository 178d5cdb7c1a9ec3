package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Semantic invariants for the PipelineOps corpus-statistics queries
  * (vocab building, hashed-feature classifier, bigram-LM scoring,
  * passage dedup, overlapping chunking). The DuckDB oracle is the
  * equivalence gate; these pin the properties a hash compare can't
  * express — and the ASCII/width precondition the XXH64 oracle chain
  * depends on.
  */
class CorpusOpsSpec extends SparkSuite {

  private def docs = Tables.load(spark, sf, "documents")

  test("quality_classifier oracle precondition: tokens are ASCII, <32 bytes") {
    // XxHash64Sql's generated chain reads bytes as ascii(t[i]) and only
    // emits the <32-byte path; a corpus change must fail HERE, not as a
    // silent oracle mismatch.
    val bad = Dedup.tokens(docs)
      .select(explode(col("t")).as("t"))
      .where(length(col("t")) >= 32 || col("t").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(bad == 0L)
  }

  test("quality_classifier: score is the exact per-token weight sum") {
    val out = q("quality_classifier").cache()
    // weights live in [-128, 127], so |score| <= 128 * n_tokens
    assert(out.where(abs(col("score")) > col("n_tokens") * 128).count() == 0)
    assert(out.where(col("keep") =!= (col("score") >= 0)).count() == 0)
    // recompute one document independently (collect-side fold)
    val row = out.orderBy("doc_id").limit(1).collect()(0)
    val toks = docs.where(col("doc_id") === row.getLong(0))
      .select(explode(Dedup.tokenArr(col("text"))).as("t"))
      .select(xxhash64(col("t")).as("h")).collect()
      .map(r => (r.getLong(0) & 255L) - 128L)
    assert(toks.length.toLong == row.getLong(1))
    assert(toks.sum == row.getLong(2))
    out.unpersist()
  }

  test("lm_bigram_score: every doc scores negative log-prob, one term per bigram") {
    val out = q("lm_bigram_score")
    val n = docs.count()
    assert(out.count() == n)
    // add-one smoothing keeps every term's probability < 1 => sum < 0
    assert(out.where(col("logp_micro") >= 0).count() == 0)
    val expect = docs.select(col("doc_id"),
      (size(Dedup.tokenArr(col("text"))) - 1).cast("long").as("nb"))
    assert(out.join(expect, "doc_id")
      .where(col("n_bigrams") =!= col("nb")).count() == 0)
  }

  test("dedup_passage: planted excerpts are fully duplicated, bases flag >= 2 blocks") {
    val out = q("dedup_passage").cache()
    val excerpts = out.where(col("doc_id") >= 2000000L)
    assert(excerpts.count() > 0)
    assert(excerpts.where(col("n_dup_blocks") =!= col("n_blocks")).count() == 0)
    assert(excerpts.where(col("clean_text") =!= "").count() == 0)
    // every planted base doc's first two 8-token blocks are duplicated
    val planted = out.where(col("doc_id") % 5 === 0 && col("doc_id") < 2000000L)
    assert(planted.where(col("n_dup_blocks") < 2).count() == 0)
    // block math: n_blocks == ceil(tokens / 8) for the base corpus
    val expect = docs.select(col("doc_id"),
      ceil(size(Dedup.tokenArr(col("text"))) / lit(8.0)).cast("long").as("eb"))
    assert(out.join(expect, "doc_id")
      .where(col("n_blocks") =!= col("eb")).count() == 0)
    out.unpersist()
  }

  test("chunk_overlap: stride-24 windows, 8-token overlap, faithful payload") {
    val out = q("chunk_overlap").cache()
    // consecutive chunks start exactly stride apart, idx is dense from 0
    assert(out.where(col("start_pos") =!= col("chunk_idx") * 24 + 1).count() == 0)
    assert(out.where(col("n_tokens") > 32 || col("n_tokens") < 1).count() == 0)
    // exact width: min(32, remaining tokens from this start)
    val widths = docs.select(col("doc_id"),
      size(Dedup.tokenArr(col("text"))).cast("long").as("n"))
    assert(out.join(widths, "doc_id")
      .where(col("n_tokens") =!=
        least(lit(32L), col("n") - col("start_pos") + 1))
      .count() == 0)
    // payload check: chunk_md5 equals md5 of the independently-sliced window
    val expect = docs
      .select(col("doc_id"), Dedup.tokenArr(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t), 24),
           s -> struct(CAST((s - 1) div 24 AS BIGINT) AS chunk_idx,
                       md5(array_join(slice(t, s, 32), ' ')) AS m))""")).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"), col("c.m").as("m"))
    assert(out.join(expect, Seq("doc_id", "chunk_idx"))
      .where(col("chunk_md5") =!= col("m")).count() == 0)
    out.unpersist()
  }

  test("vocab_topk: dense ranks, non-increasing counts, exact top-1") {
    val out = q("vocab_topk").cache()
    val rows = out.orderBy("rank").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.zipWithIndex.forall { case (r, i) => r.getAs[Int]("rank") == i + 1 })
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val top = Dedup.tokens(docs).select(explode(col("t")).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc, col("tok"))
      .limit(1).collect()(0)
    assert(rows(0).getAs[String]("tok") == top.getString(0) &&
      cnts(0) == top.getLong(1))
    out.unpersist()
  }
}
