package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property check: the Catalyst shingling agrees with a
  * plain-Scala reference implementation on arbitrary token streams.
  */
class ShinglePropertySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def referenceShingles(text: String, n: Int): Seq[String] =
    text.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq.distinct

  test("shingles == plain-Scala sliding reference on 200 random docs") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "bb", "ccc", "d", "ee", "f", "g", "hh", "i", "jj")
    val docs = (0 until 200).map { i =>
      val len = rnd.nextInt(12) // includes < n token docs
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select($"id", TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === referenceShingles(text, 3), s"doc $id: '$text'")
    }
  }

  test("MinhashSignature expression ≡ the shuffle pipeline, bit for bit (corpus + edge cases)") {
    import graft.operators.Dedup
    val corpus = Tables.documents(spark, SharedSpark.sf).select("doc_id", "text")
    val viaShuffle = Dedup.signaturesOf(Dedup.shinglesOf(corpus))
    val viaExpr = Dedup.signaturesRowLevel(corpus)
    assert(viaShuffle.count() === viaExpr.count())
    assert(viaShuffle.exceptAll(viaExpr).count() === 0L)
    assert(viaExpr.exceptAll(viaShuffle).count() === 0L)

    // edge cases: repeated runs of spaces, duplicate shingles, < 3 tokens
    val edge = Seq(
      (1L, "a  b   a b a b a b"),     // multi-space + heavy shingle dups
      (2L, "x y"),                    // too short → no signature row
      (3L, "  lead trail  pad  "),    // 3 tokens after empty-filtering
      (4L, ("tok " * 200).trim))      // one repeated token, long doc
      .toDF("doc_id", "text")
    val eShuffle = Dedup.signaturesOf(Dedup.shinglesOf(edge))
    val eExpr = Dedup.signaturesRowLevel(edge)
    assert(eShuffle.count() === 3L) // doc 2 dropped on both paths
    assert(eExpr.count() === 3L)
    assert(eShuffle.exceptAll(eExpr).count() === 0L)
    assert(eExpr.exceptAll(eShuffle).count() === 0L)
  }

  test("CharGramMinhash expression ≡ the char-shingle shuffle pipeline, bit for bit") {
    import graft.operators.Dedup
    val n = 5
    def shuffleSigs(docs: org.apache.spark.sql.DataFrame) =
      Dedup.signaturesOf(
        docs.filter(length($"text") >= n)
          .select($"doc_id", $"text",
            explode(sequence(lit(1), length($"text") - (n - 1), lit(2))).as("i"))
          .select($"doc_id", xxhash64($"text".substr($"i", lit(n))).as("h"))
          .distinct())
    val corpus = Tables.documents(spark, SharedSpark.sf).select("doc_id", "text")
    val viaShuffle = shuffleSigs(corpus)
    val viaExpr = Dedup.signaturesRowLevelChar(corpus, n, 2)
    assert(viaShuffle.count() === viaExpr.count())
    assert(viaShuffle.exceptAll(viaExpr).count() === 0L)
    assert(viaExpr.exceptAll(viaShuffle).count() === 0L)

    // edge cases: < n chars, exactly n, odd/even lengths (stride-2
    // boundary), duplicate grams, multi-byte code points (substr and the
    // kernel must both slice by CODE POINTS, not bytes)
    val edge = Seq(
      (1L, "abcd"),                     // < 5 chars → no signature row
      (2L, "abcde"),                    // exactly one gram
      (3L, "abcdef"),                   // even length, one strided gram
      (4L, "aaaaaaaaaaaa"),             // all-duplicate grams
      (5L, "héllo wörld ünïcödé çafé")) // multi-byte UTF-8
      .toDF("doc_id", "text")
    val eShuffle = shuffleSigs(edge)
    val eExpr = Dedup.signaturesRowLevelChar(edge, n, 2)
    assert(eShuffle.count() === 4L)
    assert(eExpr.count() === 4L)
    assert(eShuffle.exceptAll(eExpr).count() === 0L)
    assert(eExpr.exceptAll(eShuffle).count() === 0L)
  }

  test("MinhashSignature codegen COMPILES — no silent interpreted fallback") {
    // With fallback enabled (the default), a Janino compile error degrades
    // the whole stage to interpreted execution without failing anything —
    // exactly what happened when the generated code spelled the kernel
    // object `MinhashKernel.MODULE$`. Disable fallback so a codegen
    // regression fails this test instead of silently costing throughput.
    import graft.operators.Dedup
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = Seq((1L, "a b c d e"), (2L, "x y z w")).toDF("doc_id", "text")
      assert(Dedup.signaturesRowLevel(docs).collect().length === 2)
      assert(Dedup.signaturesRowLevelChar(docs, 5, 2).collect().length === 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("Md5PrefixLong ≡ conv(substring(md5(x),1,n),16,10) — and codegen compiles") {
    import graft.plans.GraftFunctions
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq("a", "hash merge window", "", "ünïcøde £", "x" * 500)
        .toDF("t")
      for (n <- Seq(1, 6, 12, 15)) {
        val diff = rows.select(
            GraftFunctions.md5Prefix(col("t"), n).as("native"),
            conv(substring(md5(col("t")), 1, n), 16, 10).cast("long").as("chain"))
          .filter(col("native") =!= col("chain"))
        assert(diff.count() === 0L, s"mismatch at hexChars=$n")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
