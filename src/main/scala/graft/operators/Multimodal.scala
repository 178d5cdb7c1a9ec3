package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded fake-image metadata — what a real image decoder would return. */
final case class MediaMeta(
    doc_id: Long, width: Int, height: Int, channels: Int, checksum: Long)

/** Per-item features after decode → feature-extract → "resize". */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Int,
    feature: Array[Double],   // 8-dim: mean byte value per stride bucket
    resized: Array[Double],   // 4-dim: adjacent-pair means of `feature`
    frames: Array[Int])       // "frame sample": every 64th byte, first 4

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * There is no image/audio lib in this container, so the DECODE step is a
  * deterministic fake (byte-statistics stand in for pixel decoding —
  * clearly marked below). Everything around it is the real distributed
  * shape: BinaryType column, batch iterator over partitions
  * (`mapPartitions`, the Scala analog of `mapInPandas` batches), typed
  * output schema via case-class Encoders, partition-parallel end to end.
  * Swapping in a real codec changes only the function body.
  */
object Multimodal extends QueryModule {

  /** documents.text encoded as a binary payload column — the stand-in for
    * an image/audio bytes column.
    */
  def binaryPayload(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  /** STUB DECODER — deterministic fake of an image decode. A real
    * implementation would parse the container header; this derives
    * "dimensions" from byte statistics so tests and oracles are exact.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val checksum = bytes.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 65536L)
    MediaMeta(id, n % 640 + 1, n % 480 + 1, n % 3 + 1, checksum)
  }

  /** Decode a payload dataset in partition-sized batches. */
  def decodeMeta(bin: DataFrame): Dataset[MediaMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, bytes) => decodeStub(id, bytes)
    })
  }

  /** Feature-extract + resize + frame-sample, batched per partition. */
  def extractFeatures(bin: DataFrame): Dataset[MediaFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.as[(Long, Array[Byte])].mapPartitions(_.map { case (id, bytes) =>
      val n = bytes.length
      // 8-bucket mean byte value (stride buckets = fake channel means)
      val sums = new Array[Double](8)
      val cnts = new Array[Int](8)
      var i = 0
      while (i < n) {
        val b = i % 8
        sums(b) += (bytes(i) & 0xff)
        cnts(b) += 1
        i += 1
      }
      val feature = Array.tabulate(8)(j =>
        if (cnts(j) == 0) 0.0 else sums(j) / cnts(j))
      val resized = Array.tabulate(4)(j => (feature(2 * j) + feature(2 * j + 1)) / 2)
      val frames = Array.tabulate(4)(j =>
        if (j * 64 < n) bytes(j * 64) & 0xff else -1)
      MediaFeatures(id, n, feature, resized, frames)
    })
  }

  override val queries: Seq[Q] = Seq(

    // Metadata decode — oracled: the stub's arithmetic is reproducible in
    // SQL because the payloads are ASCII (byte == codepoint, verified).
    Q("multimodal_meta",
      (s, d) => decodeMeta(binaryPayload(s, d)).toDF(),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
                     CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
                     CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS channels,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(text, ''),
                                        c -> CAST(ascii(c) AS BIGINT))),
                       (a, b) -> (a + b) % 65536) AS checksum
              FROM documents""")),

    // Full feature pipeline, flattened to scalar columns so the driver's
    // rows-check can sort (arrays aren't hashable in pandas) and DuckDB
    // can reproduce the stub arithmetic exactly (payloads are ASCII, so
    // byte value == codepoint).
    Q("multimodal_features",
      (s, d) => {
        val feats = extractFeatures(binaryPayload(s, d)).toDF()
        val cols = col("doc_id") +: col("n_bytes") +:
          ((0 until 8).map(j => round(col("feature")(j), 4).as(s"f$j")) ++
            (0 until 4).map(j => round(col("resized")(j), 4).as(s"r$j")) ++
            (0 until 4).map(j => col("frames")(j).as(s"fr$j")))
        feats.select(cols: _*)
      },
      Some {
        val fCols = (0 until 8).map(j =>
          s"coalesce(max(CASE WHEN i % 8 = $j THEN mv END), 0.0) AS f$j")
          .mkString(", ")
        // LEFT JOIN + coalesce: a zero-length text yields no per-byte rows,
        // but the Spark side still emits a row with all-zero features
        val fOut = (0 until 8).map(j =>
          s"round(coalesce(f$j, 0.0), 4) AS f$j").mkString(", ")
        val rOut = (0 until 4).map(j =>
          s"round((coalesce(f${2 * j}, 0.0) + coalesce(f${2 * j + 1}, 0.0)) / 2, 4) AS r$j")
          .mkString(", ")
        val frOut = (0 until 4).map(j =>
          s"CASE WHEN ${j * 64} < b.n THEN ascii(substr(b.text, ${j * 64 + 1}, 1)) ELSE -1 END AS fr$j")
          .mkString(", ")
        s"""WITH b AS (
              SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n, text
              FROM documents),
            ix AS (
              SELECT doc_id, CAST(unnest(range(0, n)) AS INT) AS i, text
              FROM b),
            e AS (
              SELECT doc_id, i, ascii(substr(text, i + 1, 1)) AS v
              FROM ix),
            m AS (
              SELECT doc_id, i % 8 AS i, avg(v) AS mv
              FROM e GROUP BY doc_id, i % 8),
            p AS (SELECT doc_id, $fCols FROM m GROUP BY doc_id)
            SELECT b.doc_id, b.n AS n_bytes, $fOut, $rOut, $frOut
            FROM b LEFT JOIN p USING (doc_id)"""
      })
  )
}
