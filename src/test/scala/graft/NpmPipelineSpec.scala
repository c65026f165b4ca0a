package graft

import graft.operators.NpmPipeline
import graft.sources.{LocalRegistry, Registry}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity check: same input → same (package, version,
  * dependencies, devDependencies) counts as the reference pipeline
  * (Main.scala flowDependencies + AccumulatedDependencyCount).
  */
class NpmPipelineSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  // Trimmed registry documents in the npm registry shape the reference
  // parses (NpmPackage.scala:10-18, Version.scala).
  private val registry = new LocalRegistry(Map(
    "left-pad" ->
      """{"name":"left-pad","versions":{
        |"1.0.0":{"name":"left-pad","dependencies":{"a":"^1.0.0","b":"~2.0.0"}},
        |"1.1.0":{"name":"left-pad","dependencies":{"a":"^1.0.0"},
        |         "devDependencies":{"mocha":"*","chai":"*","sinon":"*"}}}}""".stripMargin,
    "tiny" ->
      """{"name":"tiny","versions":{"0.1.0":{"name":"tiny"}}}""".stripMargin))

  test("dependencyCounts matches the reference's runtime/dev counting") {
    val names = Seq("left-pad", "tiny", "missing-pkg").toDF("line")
    val parsed = Registry.enrichWithClient(names, registry)
    val counts = NpmPipeline.dependencyCounts(parsed)
      .orderBy("package", "version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(counts.toSeq === Seq(
      ("left-pad", "1.0.0", 2, 0),
      ("left-pad", "1.1.0", 1, 3),
      ("tiny", "0.1.0", 0, 0)))
  }

  test("accumulate builds the nested package→version map; prettyLines formats it") {
    val names = Seq("left-pad", "tiny").toDF("line")
    val acc = NpmPipeline.accumulate(
      NpmPipeline.dependencyCounts(Registry.enrichWithClient(names, registry)))
    assert(acc.count() === 2L)
    val leftPad = acc.filter(col("package") === "left-pad")
      .select(map_keys(col("versions"))).collect().head.getSeq[String](0).sorted
    assert(leftPad === Seq("1.0.0", "1.1.0"))

    val lines = NpmPipeline.prettyLines(acc).select("line").as[String].collect()
    assert(lines.contains("version: 1.1.0, Dependencies: 1, DevDependencies: 3"))
  }

  test("streaming pipeline: throttled gz source → enrich → counts, equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_npm_stream_")
    def writeGz(name: String, content: String): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(dir.resolve(name)))
      out.write(content.getBytes("UTF-8")); out.close()
    }
    // two files → with maxFilesPerTrigger=1 the source is throttled to
    // two micro-batches (the reference's throttle+backpressure analog)
    writeGz("a.txt.gz", "left-pad\n")
    writeGz("b.txt.gz", "tiny\n")

    val stream = graft.sources.GzipLines.readStream(spark, dir.toString, maxFilesPerTrigger = 1)
    val counts = NpmPipeline.dependencyCounts(Registry.enrichWithClient(stream, registry))
    val q = counts.writeStream.format("memory").queryName("npm_stream_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2) // really throttled

    val streamed = spark.table("npm_stream_t")
      .select("package", "version", "dependencies", "devDependencies")
    val batch = NpmPipeline.dependencyCounts(
      Registry.enrichWithClient(Seq("left-pad", "tiny").toDF("line"), registry))
    assert(streamed.count() === 3L)
    assert(streamed.exceptAll(batch).count() === 0L)
  }
}
