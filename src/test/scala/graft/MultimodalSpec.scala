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

  test("feature pipeline shape: 8 feature + 4 resized + 4 frame columns") {
    val df = q("multimodal_features")
    val names = df.schema.fieldNames.toSeq
    assert(names == Seq("doc_id", "n_bytes") ++
      (0 until 8).map(j => s"f$j") ++ (0 until 4).map(j => s"r$j") ++
      (0 until 4).map(j => s"fr$j"))
    assert(df.count() > 0)
  }

  test("resized is the adjacent-pair mean of feature (rounding tolerance)") {
    val rows = q("multimodal_features").limit(20).collect()
    rows.foreach { r =>
      (0 until 4).foreach { j =>
        val f0 = r.getDouble(r.fieldIndex(s"f${2 * j}"))
        val f1 = r.getDouble(r.fieldIndex(s"f${2 * j + 1}"))
        val rs = r.getDouble(r.fieldIndex(s"r$j"))
        assert(math.abs(rs - (f0 + f1) / 2) < 1e-3)
      }
    }
  }

  test("payload column is BinaryType") {
    val schema = Multimodal.binaryPayload(spark, sf).schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }
}
