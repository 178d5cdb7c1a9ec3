package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded image metadata — header dims + channel count + a pixel-sum
  * checksum, all read from the DECODED raster, not the container bytes.
  */
final case class MediaMeta(
    doc_id: Long, width: Int, height: Int, channels: Int, checksum: Long)

/** Per-item features after decode → feature-extract → resize →
  * frame-sample. All integer-exact (sums, not means) so the DuckDB twin
  * hash-matches without float-rounding hazards.
  */
final case class MediaFeatures(
    doc_id: Long, n_pixels: Int,
    chan_sum: Array[Long],  // 3: per-channel pixel-value sums (R, G, B)
    quad_sum: Array[Long],  // 4: 2×2 "resize" — per-quadrant (r+g+b) sums
    frames: Array[Int])     // first 4 pixels of row 0, packed 0xRRGGBB;
                            // -1 past width (unreachable at dims()'s
                            // current w >= 4 — kept mirrored with the
                            // oracle's CASE so a dims change can't
                            // desync the two)

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with a REAL `javax.imageio` PNG decode in the hot path (no external
  * dependency — ImageIO ships with the JDK).
  *
  * The payloads are deterministic PNGs planted per doc_id: each document
  * carries a small RGB image whose pixel values follow a closed-form
  * integer formula of (doc_id, x, y). That makes the round trip honest in
  * both directions — the engine really encodes and decodes PNG rasters on
  * executors, while the DuckDB oracle can reproduce every decoded
  * statistic from the formula alone, never needing a codec. PNG is
  * lossless 8-bit sRGB, so decode(encode(pixels)) == pixels exactly;
  * MultimodalSpec additionally pins the round trip against a hand-built
  * image.
  *
  * Scale shape: everything here is map-only over the binary column —
  * encode, decode, feature extraction all run inside `mapPartitions`
  * batches (the Scala analog of `mapInPandas`), no shuffle anywhere, and
  * the payload stays an opaque BinaryType column until the decode kernel
  * touches it (at 100 TB the payloads arrive from a parquet binary
  * column; only the generator below is test-fixture plumbing).
  * `ImageIO.setUseCache(false)` keeps the codec on heap buffers —
  * the default disk-backed stream cache would add a temp-file write per
  * image per task.
  */
object Multimodal extends QueryModule {

  /** Planted image dims: bounded, non-zero, and coprime-ish moduli so
    * width/height don't correlate across the corpus.
    */
  private[graft] def dims(id: Long): (Int, Int) =
    ((id % 13 + 4).toInt, (id % 11 + 3).toInt)

  /** The per-pixel RGB formula (doc_ids are non-negative — asserted in
    * MultimodalSpec — so `%` agrees between Java, Spark and DuckDB).
    */
  private[graft] def pixel(id: Long, w: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + y.toLong * w + x) % 256).toInt,
    ((id * 17 + x.toLong * 7 + y) % 256).toInt,
    ((id * 7 + x.toLong + y.toLong * 3) % 256).toInt)

  /** One doc's planted PNG bytes (encoder side of the round trip). */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(id, w, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode one payload or fail with the doc_id attached: ImageIO.read
    * returns NULL (it does not throw) for bytes no registered codec
    * accepts, and dereferencing that null would abort the query with an
    * opaque NPE carrying no record identity. The raise-with-context
    * posture matches emb()'s raise_error on a bad embedding width.
    */
  private def decodeImage(id: Long, bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException(
      s"graft.Multimodal: undecodable image payload for doc_id=$id " +
        s"(${bytes.length} bytes)")
    img
  }

  /** Untimed codec warmup for Bench: one encode→decode round trip pays
    * ImageIO's plugin-registry scan and PNG codec class-init once per
    * JVM, so the first timed multimodal query measures steady-state
    * decode work (local mode shares the JVM; on a cluster the same
    * first-touch amortizes over each executor's task stream).
    */
  def warmupCodec(): Unit = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(encodePng(1L)))
    require(img != null)
  }

  /** The documents table's binary media column: (doc_id, payload) with
    * payload = the planted PNG. Batched per partition like every other
    * kernel here.
    */
  def binaryPayload(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, encodePng(id)))
      }.toDF("doc_id", "payload")
  }

  /** Real decode: parse the PNG, read dims + channel count from the
    * decoded image, checksum the raster (sum of all channel values mod
    * 65536).
    */
  def decodeMeta(bin: DataFrame): Dataset[MediaMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.as[(Long, Array[Byte])].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { case (id, bytes) =>
        val img = decodeImage(id, bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        MediaMeta(id, w, h, img.getColorModel.getNumComponents, sum % 65536L)
      }
    }
  }

  /** Decode → feature-extract (per-channel sums) → resize (2×2 quadrant
    * luma-sum grid) → frame-sample (row-0 pixels), batched per partition.
    */
  def extractFeatures(bin: DataFrame): Dataset[MediaFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.as[(Long, Array[Byte])].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { case (id, bytes) =>
        val img = decodeImage(id, bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        val chan = new Array[Long](3)
        val quad = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            chan(0) += r; chan(1) += g; chan(2) += b
            // quadrant rule x*2 < w (identical integer form in the
            // oracle) — a 2×2 block-sum "resize"
            val q = (if (y * 2 < h) 0 else 2) + (if (x * 2 < w) 0 else 1)
            quad(q) += r + g + b
            x += 1
          }
          y += 1
        }
        val frames = Array.tabulate(4)(j =>
          if (j < w) img.getRGB(j, 0) & 0xffffff else -1)
        MediaFeatures(id, w * h, chan, quad, frames)
      }
    }
  }

  /** Closed-form per-pixel CTE shared by both oracles: every decoded
    * channel value re-derived from the planted formula.
    */
  private val pixelCte =
    """b AS (SELECT doc_id, CAST(doc_id % 13 + 4 AS INT) AS w,
                    CAST(doc_id % 11 + 3 AS INT) AS h
            FROM documents),
       px AS (SELECT doc_id, w, h, i // w AS y, i % w AS x
              FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i
                    FROM b)),
       v AS (SELECT doc_id, w, h, x, y,
                    (doc_id * 31 + y * w + x) % 256 AS r,
                    (doc_id * 17 + x * 7 + y) % 256 AS g,
                    (doc_id * 7 + x + y * 3) % 256 AS b
             FROM px)"""

  override val queries: Seq[Q] = Seq(

    // Metadata decode — the Spark side round-trips real PNG bytes; the
    // oracle replays the planted pixel formula (decode is lossless, so
    // the two must agree bit-for-bit).
    Q("multimodal_meta",
      (s, d) => decodeMeta(binaryPayload(s, d)).toDF(),
      Some(s"""WITH $pixelCte
              SELECT doc_id, CAST(max(w) AS INT) AS width,
                     CAST(max(h) AS INT) AS height,
                     CAST(3 AS INT) AS channels,
                     CAST(sum(r + g + b) % 65536 AS BIGINT) AS checksum
              FROM v GROUP BY doc_id""")),

    // Full feature pipeline, flattened to scalar integer columns so the
    // driver's compare can sort and hash them (arrays aren't hashable in
    // pandas).
    Q("multimodal_features",
      (s, d) => {
        val feats = extractFeatures(binaryPayload(s, d)).toDF()
        val cols = col("doc_id") +: col("n_pixels") +:
          ((0 until 3).map(j => col("chan_sum")(j).as(s"cs$j")) ++
            (0 until 4).map(j => col("quad_sum")(j).as(s"q$j")) ++
            (0 until 4).map(j => col("frames")(j).as(s"fr$j")))
        feats.select(cols: _*)
      },
      Some {
        val csCols = Seq("r", "g", "b").zipWithIndex.map { case (c, j) =>
          s"CAST(sum($c) AS BIGINT) AS cs$j" }.mkString(", ")
        val qCols = (0 until 4).map { q =>
          val (qy, qx) = (q / 2, q % 2)
          val cond = s"(CASE WHEN y * 2 < h THEN 0 ELSE 1 END) = $qy AND " +
            s"(CASE WHEN x * 2 < w THEN 0 ELSE 1 END) = $qx"
          s"CAST(sum(CASE WHEN $cond THEN r + g + b ELSE 0 END) AS BIGINT) AS q$q"
        }.mkString(", ")
        val frCols = (0 until 4).map { j =>
          s"""CAST(CASE WHEN $j < w THEN
                ((doc_id * 31 + $j) % 256) * 65536 +
                ((doc_id * 17 + $j * 7) % 256) * 256 +
                ((doc_id * 7 + $j) % 256)
              ELSE -1 END AS INT) AS fr$j"""
        }.mkString(", ")
        s"""WITH $pixelCte,
              agg AS (SELECT doc_id, $csCols, $qCols
                      FROM v GROUP BY doc_id)
            SELECT b.doc_id, CAST(b.w * b.h AS INT) AS n_pixels,
                   cs0, cs1, cs2, q0, q1, q2, q3, $frCols
            FROM b JOIN agg USING (doc_id)"""
      })
  )
}
