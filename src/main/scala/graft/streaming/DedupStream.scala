package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twin of the exact-dedup operator: documents arrive as a
  * stream, and the engine maintains the per-content-hash dedup state
  * (keeper id + copy count) across micro-batches — the shape of a
  * continuously-ingesting corpus build, where dedup must be a standing
  * stateful aggregation rather than a batch job over a frozen corpus.
  *
  * State is one small record per DISTINCT content hash, partitioned by
  * the hash — the same horizontal-scale posture as the events streams
  * (state ∝ unique corpus size, shuffles on the group key). The batch
  * twin is `dedup_exact`; StreamingSpec pins exact agreement.
  */
object DedupStream {

  /** documents.parquet raw schema (TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over a parquet dir, one file per trigger — pass a
    * glob matching several files (e.g. a split corpus) to exercise
    * multi-batch state accumulation; the driver's single-file layout
    * yields one trigger.
    */
  def source(spark: SparkSession, dir: String,
      glob: String = "documents.parquet"): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Stateful exact dedup over the planted-duplicate corpus — the
    * corpus construction is SHARED with the batch operator
    * (`Dedup.plantDuplicates`), so stream and batch cannot drift: per
    * content hash, the smallest doc id seen so far and the running
    * copy count.
    */
  def dedupCounts(docs: DataFrame): DataFrame =
    graft.operators.Dedup.plantDuplicates(docs)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  def dedupCounts(spark: SparkSession, dir: String): DataFrame =
    dedupCounts(source(spark, dir))

  /** Streaming twin of the batch `decontaminate` operator: documents
    * stream in and each is flagged against a STATIC held-out eval
    * n-gram set at ingest time — the benchmark-leak filter of a
    * continuously-ingesting corpus build, where contaminated documents
    * must be dropped before they ever reach training shards.
    *
    * Shape: completely STATELESS (Append mode, no watermark, zero
    * state store) — the eval hash set is collapsed to a single-row
    * array (benchmark-scale: a fixed eval suite, not a corpus) and
    * cross-joined onto the stream; per-document overlap is a per-row
    * `array_intersect` over the doc's distinct n-gram hashes. Batch
    * and stream share the n-gram definition
    * ([[graft.operators.Dedup.ngramHashArrExpr]]) and the eval-set
    * definition, so they cannot drift; StreamingSpec pins exact
    * row-level agreement with the batch operator.
    *
    * At 100 TB: throughput is corpus-linear with no shuffle on the
    * stream side; a real eval suite (~10⁵-10⁶ n-grams, a few MB as an
    * 8-byte-hash array) rides the broadcast exactly like the batch
    * op's AQE-broadcast overlap join.
    */
  def decontaminate(docs: DataFrame, evalHashes: DataFrame): DataFrame = {
    // single-row eval array, keyed so the stream-static join is a plain
    // supported equi inner join (stream cross joins are restricted).
    // PERSISTED: the static side of a stream-static join re-executes in
    // every micro-batch plan — without the persist, an eval set derived
    // from a corpus scan (as in StreamingSpec) would re-tokenize the
    // corpus per trigger.
    val evalArr = evalHashes
      .agg(collect_set(col("h")).as("ev")).withColumn("__k", lit(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs
      .select(col("doc_id"),
        graft.operators.Dedup.tokenArr(col("text")).as("t"))
      .withColumn("hs",
        when(size(col("t")) >= 8,
          array_distinct(expr(graft.operators.Dedup.ngramHashArrExpr(8))))
          .otherwise(typedLit(Seq.empty[Long])))
      .withColumn("__k", lit(1))
      .join(evalArr, "__k")
      .select(col("doc_id"),
        size(array_intersect(col("hs"), col("ev"))).cast("long")
          .as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}
