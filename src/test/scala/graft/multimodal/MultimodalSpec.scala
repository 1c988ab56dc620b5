package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val r = m.selectExpr("doc_id", "mime", "n_bytes",
      "octet_length(payload) AS ob").head()
    assert(r.getString(1) == "application/octet-stream")
    assert(r.getLong(2) == r.getInt(3).toLong) // metadata matches payload
    assert(m.schema("payload").dataType.typeName == "binary")
  }

  test("decode stub + byte histogram are deterministic and total") {
    val m = Multimodal.byteHistogram(Multimodal.decodeStub(Multimodal.mediaTable(spark, sf0001)))
    val rows = m.select(col("n_bytes"),
      col("decoded.width"), col("decoded.height"),
      aggregate(col("byte_hist"), lit(0), (a, b) => a + b).as("hist_total")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == (r.getLong(0) % 640 + 1).toInt)
      assert(r.getInt(2) == (r.getLong(0) % 480 + 1).toInt)
      assert(r.getInt(3).toLong == r.getLong(0), "histogram bins sum to byte count")
    }
  }

  test("frame sampling: partition-parallel, stride respected, bytes partition the payload") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf0001)
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("payload"))
      .as[Multimodal.MediaRow]
    val frames = Multimodal.frameSample(media, frameBytes = 40, stride = 2).cache()
    val byDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    val first = media.filter(_.doc_id == 0L).head()
    val expected = (math.ceil(first.n_bytes / 40.0).toInt + 1) / 2
    assert(byDoc(0L) == expected.toLong)
    assert(frames.collect().forall(f => f.frame_idx % 2 == 0 && f.bytes.length <= 40))
  }
}
