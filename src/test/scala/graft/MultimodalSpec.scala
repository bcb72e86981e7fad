package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sfTiny)

  test("featureExtract: one fixed-dim vector per document, deterministic") {
    val f1 = Multimodal.featureExtract(spark, media).cache()
    assert(f1.count() === media.count())
    assert(f1.filter(col("dim") =!= 8 || size(col("features")) =!= 8).count() === 0)
    // deterministic across runs
    val a = f1.collect().map(m => (m.doc_id, m.features.toSeq)).toMap
    val b = Multimodal.featureExtract(spark, media).collect()
      .map(m => (m.doc_id, m.features.toSeq)).toMap
    assert(a === b)
    f1.unpersist()
  }

  test("frameSample: stride-spaced frame indices, frame bytes come from the payload") {
    val frames = Multimodal.frameSample(spark, media, frameBytes = 64, stride = 4).cache()
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() === 0)
    // spot check one document end-to-end
    val doc = media.orderBy("doc_id").head
    val payload = doc.getAs[Array[Byte]]("payload")
    val docFrames = frames.filter(col("doc_id") === doc.getLong(0))
      .orderBy("frame_idx").collect()
    assert(docFrames.length === (0 until payload.length / 64 by 4).size)
    assert(docFrames.head.frame.toSeq === payload.slice(0, 64).toSeq)
    frames.unpersist()
  }

  test("resize: dims within target box, payload truncated proportionally") {
    val r = Multimodal.resize(spark, media, targetW = 64, targetH = 48).cache()
    assert(r.count() === media.count())
    assert(r.filter(col("width") > 64 || col("height") > 48).count() === 0)
    assert(r.filter(col("width") < 1 || col("height") < 1).count() === 0)
    r.unpersist()
  }
}
