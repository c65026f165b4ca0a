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

  test("windowed counts are invariant to micro-batch boundaries (trigger pacing)") {
    val oneBatch = StreamOps.windowedCounts(spark, sf)
    // 4 staged files, 1 per trigger → 4 micro-batches of accumulated state
    val paced = StreamOps.windowedCountsPaced(spark, sf, nFiles = 4, maxFilesPerTrigger = 1)
    assert(paced.count() === oneBatch.count())
    assert(paced.exceptAll(oneBatch).count() === 0L)
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

  test("streaming near-dup suppression: batch-internal AND cross-batch dups dropped, uniques kept") {
    import spark.implicits._
    // documents.parquet as a DIRECTORY of two files = two micro-batches
    val root = java.nio.file.Files.createTempDirectory("graft_neardup_spec_")
    val docsDir = root.resolve("documents.parquet")
    java.nio.file.Files.createDirectories(docsDir)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val batch0 = Seq(
      (1L, base),                                   // kept (first)
      (2L, base.replace("tango", "uniform")),       // in-batch near-dup of 1
      (3L, "totally different content words " +
        "one two three four five six seven eight nine ten eleven twelve"))
    val batch1 = Seq(
      (10L, base.replace("alpha", "zulu")),         // cross-batch near-dup of 1
      (11L, "another unrelated document body with its own vocabulary " +
        "red orange yellow green blue indigo violet umber ochre teal"))
    batch0.toDF("doc_id", "text").coalesce(1)
      .write.parquet(docsDir.resolve("b0").toString)
    batch1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(docsDir.resolve("b1").toString)
    // two dirs of one part-file each; order batches by mtime
    val f0 = java.nio.file.Files.list(docsDir.resolve("b0"))
      .filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
    val f1 = java.nio.file.Files.list(docsDir.resolve("b1"))
      .filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
    java.nio.file.Files.move(f0, docsDir.resolve("000.parquet"))
    java.nio.file.Files.move(f1, docsDir.resolve("001.parquet"))
    Seq("b0", "b1").foreach { b =>
      java.nio.file.Files.walk(docsDir.resolve(b))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    docsDir.resolve("000.parquet").toFile.setLastModified(1000000L)
    docsDir.resolve("001.parquet").toFile.setLastModified(2000000L)

    val kept = StreamOps.nearDupSuppress(spark, root.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 11L))
  }

  test("streaming near-dup suppression equals the batch estimate-dedup on a single batch") {
    val streamed = StreamOps.nearDupSuppress(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val losers = graft.operators.Dedup.resolveClusters(
        graft.operators.Dedup.minhashApprox(spark, sf, 0.5))
      .filter(col("rep") =!= col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val all = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed === all -- losers)
  }
}
