package graft

import graft.operators.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamAndMultimodalSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("streaming windowed counts equal the batch equivalent") {
    val streamed = StreamOps.windowedCounts(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
  }

  test("streaming dedup emits exactly the distinct key set") {
    val streamed = StreamOps.streamDedup(spark, sf)
    val batch = Tables.events(spark, sf).select("user_id", "event_type").distinct()
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
  }

  test("multimodal: binaryMeta byte count equals utf8 length") {
    val bad = Multimodal.binaryMeta(spark, sf)
      .join(Tables.documents(spark, sf),
        col("asset_id") === col("doc_id"))
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(bad.count() === 0L) // ascii corpus: bytes == chars
  }

  test("multimodal: feature extraction is batched, typed, deterministic") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val row = feats.orderBy("asset_id").collect().head
    assert(row.getSeq[Double](1).length === Multimodal.StubDecoder.FeatureDim)
    val again = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
      .orderBy("asset_id").collect().head
    assert(row.getSeq[Double](1) === again.getSeq[Double](1))
  }

  test("multimodal: frame sampling yields bounded per-asset fan-out") {
    val frames = Multimodal.frameSample(Multimodal.assets(spark, sf), 16, 4)
    val counts = frames.groupBy("asset_id").agg(count(lit(1)).as("n"))
    assert(counts.filter(col("n") > 4).count() === 0L)
    assert(frames.count() > 0L)
  }
}
