package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.sources.GzipLines
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesAndFunctionsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("GzipLines reads gzipped line files transparently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gz_")
    val f = dir.resolve("packages.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write("left-pad\nreact\n\nlodash\n".getBytes("UTF-8")); out.close()
    val lines = GzipLines.read(spark, f.toString).as[String].collect().sorted
    assert(lines.toSeq === Seq("left-pad", "lodash", "react")) // empty dropped
  }

  test("cosine/dot match hand-computed values") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      round(VectorFunctions.cosine(col("a"), col("b")), 6)).collect().head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 0.974632) < 1e-6)
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Array(0.5f, -0.25f, 8.0f))).toDF("v")
    val c = df.select(VectorFunctions.cosine(col("v"), col("v"))).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("shingles: correct count, distinct, empty when too short") {
    val df = Seq("a b c d", "x y").toDF("text")
    val sh = df.select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty)
  }
}
