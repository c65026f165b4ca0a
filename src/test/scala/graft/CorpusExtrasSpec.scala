package graft

import graft.operators.{CorpusOps, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-2 corpus extras: heavy hitters, deterministic
  * sampling, int8 quantization, duplicate-span removal, cross-corpus
  * near-dup, Bloom decontamination.
  */
class CorpusExtrasSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("topTokens: descending by n, df <= n, df <= corpus size") {
    val nDocs = spark.read.parquet(SharedSpark.sf + "/documents.parquet").count()
    // sf0.001's synthetic vocabulary is ~31 tokens — stay under it
    val out = TextAnalysis.topTokens(spark, SharedSpark.sf, topN = 20)
      .as[(String, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.map(_._2).sameElements(out.map(_._2).sorted.reverse))
    assert(out.forall { case (t, n, df) => t.nonEmpty && df <= n && df <= nDocs })
  }

  test("sampleCorpus: deterministic, subset, ~2/16 of the corpus") {
    val a = CorpusOps.sampleCorpus(spark, SharedSpark.sf).collect()
    val b = CorpusOps.sampleCorpus(spark, SharedSpark.sf).collect()
    assert(a.toSeq == b.toSeq) // re-run identical — no RNG state anywhere
    val total = spark.read.parquet(SharedSpark.sf + "/documents.parquet").count()
    // md5 is uniform over hex digits: 2/16 expected, generous tolerance
    assert(a.length > total / 16 && a.length < total * 4 / 16,
      s"sample ${a.length} of $total")
    // selection matches an independent recomputation of the predicate
    val expected = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .count()
    assert(a.length == expected)
  }

  test("quantizeInt8: scale positive, saturation hit, error bounded by grid") {
    val out = Similarity.quantizeInt8(spark, SharedSpark.sf)
      .as[(Long, Double, Long, Double)].collect()
    val nVec = spark.read.parquet(SharedSpark.sf + "/embeddings.parquet").count()
    assert(out.length == nVec)
    out.foreach { case (_, scale, nSat, err) =>
      assert(scale > 0)
      // the max-|x| element quantizes to exactly ±127
      assert(nSat >= 1)
      // per-element error ≤ (scale/2)²; 64 dims
      assert(err >= 0 && err <= 64 * (scale / 2) * (scale / 2) + 1e-9)
    }
  }

  test("duplicateSpans: repeated 10-token window removed, unique text kept") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler unique zero tail words here now", "s0", "en", 1),
      (1L, s"prefix one $boiler more unique text", "s0", "en", 1),
      (2L, "totally unique document with no repeats at all", "s0", "en", 1)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("spans_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.duplicateSpans(spark, dir, n = 10)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // both docs containing the boilerplate lose exactly its 10 tokens
    assert(byId(0L)._3 == 10 && byId(1L)._3 == 10)
    assert(byId(0L)._4 == "unique zero tail words here now")
    assert(byId(1L)._4 == "prefix one more unique text")
    // the unique doc is untouched
    assert(byId(2L)._3 == 0)
    assert(byId(2L)._4 == "totally unique document with no repeats at all")
  }

  test("crossCorpusNearDup: one side in src0-9, other in src10-19; ≡ exhaustive cross-restriction") {
    val out = Dedup.crossCorpusNearDup(spark, SharedSpark.sf).collect()
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val aSrc = (0 to 9).map(i => s"src$i").toSet
    out.foreach { r =>
      assert(aSrc.contains(docs(r.getLong(0))))
      assert(!aSrc.contains(docs(r.getLong(1))))
    }
    // cross pairs = the self-join pair set restricted to cross-class pairs
    val self = Dedup.minhashLsh(spark, SharedSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = self.flatMap { case (a, b, j) =>
      (aSrc.contains(docs(a)), aSrc.contains(docs(b))) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _             => None
      }
    }.sortBy(p => (p._1, p._2))
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == expected.toSeq)
  }

  test("decontaminateBloom ≡ decontaminate exactly (sketch admits, exact join confirms)") {
    val exact = CorpusOps.decontaminate(spark, SharedSpark.sf)
      .as[(Long, Long)].collect().toSeq
    val bloom = CorpusOps.decontaminateBloom(spark, SharedSpark.sf)
      .as[(Long, Long)].collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }
}
