package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("decode stub metadata matches independent local computation") {
    val texts = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val metas = q("multimodal_meta").collect()
    assert(metas.length == texts.size)
    metas.foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      assert(r.getInt(1) == bytes.length % 640 + 1)
      assert(r.getInt(2) == bytes.length % 480 + 1)
      assert(r.getInt(3) == bytes.length % 3 + 1)
      assert(r.getLong(4) == bytes.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 65536L))
    }
  }

  test("feature pipeline shapes: 8-dim feature, 4-dim resized, 4 frames") {
    val rows = q("multimodal_features").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("feature")).length == 8)
      assert(r.getSeq[Double](r.fieldIndex("resized")).length == 4)
      assert(r.getSeq[Int](r.fieldIndex("frames")).length == 4)
    }
  }

  test("resized is the adjacent-pair mean of feature (rounding tolerance)") {
    val rows = q("multimodal_features").limit(20).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      val rs = r.getSeq[Double](r.fieldIndex("resized"))
      (0 until 4).foreach { j =>
        assert(math.abs(rs(j) - (f(2 * j) + f(2 * j + 1)) / 2) < 1e-3)
      }
    }
  }

  test("payload column is BinaryType") {
    val schema = Multimodal.binaryPayload(spark, sf).schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }
}
