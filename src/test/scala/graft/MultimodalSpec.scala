package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("oracle precondition: doc_ids are non-negative (Java/Spark/DuckDB % agree)") {
    val neg = Tables.load(spark, sf, "documents")
      .where(col("doc_id") < 0).count()
    assert(neg == 0L)
  }

  test("payloads are real PNGs: magic bytes + ImageIO round trip is lossless") {
    val rows = Multimodal.binaryPayload(spark, sf).limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      // PNG signature
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')
      // independent decode here must reproduce the planted formula
      // pixel-for-pixel — PNG is lossless 8-bit sRGB
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val (w, h) = Multimodal.dims(id)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (pr, pg, pb) = Multimodal.pixel(id, w, x, y)
        assert(((rgb >> 16) & 0xff) == pr && ((rgb >> 8) & 0xff) == pg &&
          (rgb & 0xff) == pb, s"pixel mismatch id=$id ($x,$y)")
      }
    }
  }

  test("decoded metadata matches independent local computation of the formula") {
    val metas = q("multimodal_meta").collect()
    assert(metas.length == Tables.load(spark, sf, "documents").count())
    metas.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.dims(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getInt(3) == 3)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (pr, pg, pb) = Multimodal.pixel(id, w, x, y)
        sum += pr + pg + pb
      }
      assert(r.getLong(4) == sum % 65536L, s"checksum mismatch id=$id")
    }
  }

  test("feature pipeline: real pixel stats — channel/quadrant sums, frame samples") {
    val df = q("multimodal_features")
    val names = df.schema.fieldNames.toSeq
    assert(names == Seq("doc_id", "n_pixels") ++
      (0 until 3).map(j => s"cs$j") ++ (0 until 4).map(j => s"q$j") ++
      (0 until 4).map(j => s"fr$j"))
    val rows = df.limit(25).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.dims(id)
      assert(r.getInt(1) == w * h)
      val chan = new Array[Long](3)
      val quad = new Array[Long](4)
      for (y <- 0 until h; x <- 0 until w) {
        val (pr, pg, pb) = Multimodal.pixel(id, w, x, y)
        chan(0) += pr; chan(1) += pg; chan(2) += pb
        val qi = (if (y * 2 < h) 0 else 2) + (if (x * 2 < w) 0 else 1)
        quad(qi) += pr + pg + pb
      }
      (0 until 3).foreach(j => assert(r.getLong(r.fieldIndex(s"cs$j")) == chan(j)))
      (0 until 4).foreach(j => assert(r.getLong(r.fieldIndex(s"q$j")) == quad(j)))
      // quadrant sums partition the total: resize conserves mass
      assert(quad.sum == chan.sum)
      (0 until 4).foreach { j =>
        val expect = if (j < w) {
          val (pr, pg, pb) = Multimodal.pixel(id, w, j, 0)
          (pr << 16) | (pg << 8) | pb
        } else -1
        assert(r.getInt(r.fieldIndex(s"fr$j")) == expect)
      }
    }
  }

  test("undecodable payload fails with the doc_id in the error, not an NPE") {
    import spark.implicits._
    // ImageIO.read returns null (not an exception) for bytes no codec
    // accepts; the kernel must turn that into a per-record error that
    // names the record
    val bad = Seq((42L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad).collect()
    }
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    assert(msg.contains("doc_id=42"), s"error lacks record identity: $msg")
  }

  test("payload column is BinaryType") {
    val schema = Multimodal.binaryPayload(spark, sf).schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }
}
