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
}
