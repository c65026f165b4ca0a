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
}
