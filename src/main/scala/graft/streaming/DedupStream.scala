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
}
