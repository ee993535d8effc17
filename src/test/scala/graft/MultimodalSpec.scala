package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private lazy val media = Multimodal.fixtureFromDocuments(spark, sf).cache()

  test("fixture carries binary payloads with typed metadata") {
    assert(media.count() == 500)
    val row = media.filter(col("media_id") === 0).head()
    assert(row.payload.nonEmpty && row.format == "fake/rgb8" && row.width > 0)
  }

  test("feature extraction is deterministic with fixed dimension") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.feature.toSeq == b.feature.toSeq)
      assert(a.feature.length == Multimodal.FeatureDim)
    }
    // ASCII corpus: payload bytes == n_chars
    val chars = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1.foreach(f => assert(f.n_bytes == chars(f.media_id)))
  }

  test("frame sampling yields the expected frame count") {
    val frames = Multimodal.sampleFrames(media.toDF(), frameSize = 32, stride = 16, maxFrames = 4)
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n")).collect()
    counts.foreach(r => assert(r.getAs[Long]("n") >= 1 && r.getAs[Long]("n") <= 4))
  }

  test("resize truncates payloads") {
    val resized = Multimodal.resize(media.toDF(), targetBytes = 40)
    assert(resized.filter(octet_length(col("payload")) > 40).count() == 0)
  }
}
