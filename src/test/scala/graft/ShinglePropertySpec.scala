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
}
