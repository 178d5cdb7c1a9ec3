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

  /** Streaming source over the driver's parquet dir; one file per
    * trigger so multi-batch state accumulation is actually exercised.
    */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Stateful exact dedup over the planted-duplicate corpus (stream ∪
    * id-shifted stream, like the batch corpus): per content hash, the
    * smallest doc id seen so far and the running copy count.
    */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val docs = source(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("text"))
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    corpus
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }
}
