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

  test("heavyHitters: equals the exact HAVING form; narrow grid still exact") {
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
    val tok = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val total = tok.count().toDouble
    val exact = tok.groupBy("token").count()
      .filter(col("count") >= total / 100)
      .as[(String, Long)].collect().toMap
    val out = TextAnalysis.heavyHitters(spark, SharedSpark.sf)
      .as[(String, Long)].collect()
    assert(out.toMap == exact)
    assert(out.map(_._2).sameElements(out.map(_._2).sorted.reverse))
    // a 64-bucket grid forces collisions: extra CANDIDATES are possible but
    // the exact re-count must still reject them — output unchanged
    val narrow = TextAnalysis.heavyHitters(spark, SharedSpark.sf, width = 64)
      .as[(String, Long)].collect()
    assert(narrow.toMap == exact)
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

  test("bpeMerges: hand-computed merge sequence on a constructed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    // words: aaab x2, aab x1
    // pairs: (a,a) 2*2+1=5, (a,b) 2+1=3          -> merge1 (a,a) n=5
    // then aaab=[aa,a,b], aab=[aa,b]
    // pairs: (aa,a) 2, (a,b) 2, (aa,b) 1; tie -> p1 asc: (a,b) wins
    //                                            -> merge2 (a,b) n=2
    // then aaab=[aa,ab], aab=[aa,b]
    // pairs: (aa,ab) 2, (aa,b) 1                 -> merge3 (aa,ab) n=2
    Seq((1L, "aaab aaab aab", "en", "s", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.bpeMerges(spark, dir, k = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out.take(3) == Seq((1, "a", "a", 5L), (2, "a", "b", 2L), (3, "aa", "ab", 2L)))
    // iteration 4 merges the remaining top pair; corpus exhausts before k=5
    assert(out.length <= 5 && out.map(_._1) == (1 to out.length))
  }

  test("bpeMerges: runs on the real corpus, weights positive, vocab grows") {
    val out = TextAnalysis.bpeMerges(spark, SharedSpark.sf, k = 4)
      .as[(Int, String, String, Long)].collect()
    assert(out.length == 4)
    assert(out.forall(_._4 > 0))
    // each merged token is the concatenation of its parts (vocab growth)
    assert(out.forall { case (_, p1, p2, _) => (p1 + p2).nonEmpty })
  }

  test("bpeMergesBatched: batch=1 is bit-identical to the sequential trainer; batched rounds are symbol-disjoint") {
    val seq6 = TextAnalysis.bpeMerges(spark, SharedSpark.sf, k = 6)
      .as[(Int, String, String, Long)].collect().toSeq
    val b1 = TextAnalysis.bpeMergesBatched(spark, SharedSpark.sf, k = 6, batch = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(b1 == seq6)
    val b4 = TextAnalysis.bpeMergesBatched(spark, SharedSpark.sf, k = 12, batch = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(b4.length == 12 && b4.map(_._1) == (1 to 12) && b4.forall(_._4 > 0))
    // within each round of 4, admitted pairs share no symbol (incl. outputs)
    b4.grouped(4).foreach { round =>
      val syms = round.flatMap { case (_, p1, p2, _) => Seq(p1, p2, p1 + p2) }
      assert(syms.distinct.size == syms.size, s"round not disjoint: $round")
    }
    // the first merge of round 1 is the global argmax — same as sequential
    assert(b4.head == seq6.head)
  }

  test("bpeEncode: bounds hold and more merges never lengthen the encoding") {
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).cast("long").as("nw"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val k8 = TextAnalysis.bpeEncode(spark, SharedSpark.sf, k = 8)
      .as[(Long, Long, Long)].collect()
    assert(k8.length == docs.size)
    k8.foreach { case (id, nTok, nBpe) =>
      val (nw, nc) = docs(id)
      assert(nTok == nw)
      // each word is >= 1 symbol and <= its character count
      assert(nBpe >= nTok && nBpe <= nc, s"doc $id: $nBpe not in [$nTok, $nc]")
    }
    val k2 = TextAnalysis.bpeEncode(spark, SharedSpark.sf, k = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    k8.foreach { case (id, _, nBpe) => assert(nBpe <= k2(id)) }
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

  test("lmScore: every doc scored, ppm in [0, 1e6], repeated text scores the ceiling") {
    val out = CorpusOps.lmScore(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    val nDocs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.length == nDocs)
    assert(out.forall { case (_, n, ppm) => n > 0 && ppm >= 0 && ppm <= 1000000 })
    // a document whose bigrams are all unique LEFT contexts would score
    // 1e6 exactly; the corpus mean must sit strictly inside the range
    val mean = out.map(_._3).sum / out.length
    assert(mean > 0 && mean < 1000000)
  }

  test("lmScore: hand-checked on a constructed two-doc corpus") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("lmscore").toString
    // corpus bigrams: doc0 "a b a b" -> (a,b)(b,a)(a,b); doc1 "a b c" -> (a,b)(b,c)
    // pair counts: (a,b)=3, (b,a)=1, (b,c)=1 ; left counts: a=3, b=2? no:
    // lefts: a appears as w1 in (a,b)x3 -> c1(a)=3; b as w1 in (b,a),(b,c) -> c1(b)=2
    Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = CorpusOps.lmScore(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc0: ppm((a,b))=floor(3e6/3)=1000000 twice, ppm((b,a))=floor(1e6/2)=500000
    //   -> floor((1000000+500000+1000000)/3) = 833333
    assert(scores(0L) == ((3L, 833333L)))
    // doc1: ppm((a,b))=1000000, ppm((b,c))=floor(1e6/2)=500000 -> 750000
    assert(scores(1L) == ((2L, 750000L)))
  }

  test("trigramScore: hand-checked backoff on a constructed ref/ood corpus") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("trigram").toString
    // ref doc "a b c a b c": tri counts abc=2,bca=1,cab=1;
    // bi counts ab=2,bc=2,ca=1; left-unigram a=2,b=2,c=1
    Seq((0L, "a b c a b c", "ref"), (1L, "a b c x", "ood"),
        (2L, "z a b", "ood"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.trigramScore(spark, dir, refSources = Seq("ref"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc0 (self-ref): abc x2 -> 1e6 each, bca -> 1e6/2, cab -> 1e6/1
    assert(out(0L) == ((4L, 875000L)))
    // doc1: abc hit -> 1e6; bcx miss, backoff (c,x) not in ref -> 0
    assert(out(1L) == ((2L, 500000L)))
    // doc2: zab miss -> backoff p(b|a)=2/2 scaled by alpha 40% -> 400000
    assert(out(2L) == ((1L, 400000L)))
  }

  test("trigramScore: ref docs score higher than the corpus at large") {
    val out = CorpusOps.trigramScore(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(out.forall { case (_, n, ppm) => n > 0 && ppm >= 0 && ppm <= 1000000 })
    val refIds = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .filter(col("source").isin((0 to 4).map(i => s"src$i"): _*))
      .select("doc_id").as[Long].collect().toSet
    val (refS, oodS) = out.partition(r => refIds.contains(r._1))
    assert(refS.nonEmpty && oodS.nonEmpty)
    // in-domain (self-trained) docs must out-score out-of-domain ones
    assert(refS.map(_._3).sum / refS.length > oodS.map(_._3).sum / oodS.length)
  }

  test("dupHistogram: doc counts add back to the corpus, removable = docs - clusters") {
    val out = CorpusOps.dupHistogram(spark, SharedSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = spark.read.parquet(SharedSpark.sf + "/documents.parquet").count()
    assert(out.map(_._3).sum == nDocs)
    assert(out.forall { case (sz, nc, nd, rem) => nd == sz * nc && rem == nd - nc })
  }
}
