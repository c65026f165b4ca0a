package graft

import graft.operators.{CorpusOps, Scrub}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("bigramCounts: adjacent pairs with empty tokens skipped over") {
    val out = CorpusOps.bigramCounts(spark, SharedSpark.sf, topN = 5)
      .as[(String, String, Long)].collect()
    assert(out.length == 5)
    assert(out.map(_._3).sameElements(out.map(_._3).sorted.reverse))
    assert(out.forall { case (a, b, n) => a.nonEmpty && b.nonEmpty && n > 0 })
  }

  test("packSequences: offsets are a per-source prefix sum, chunks consistent") {
    val out = CorpusOps.packSequences(spark, SharedSpark.sf, seqLen = 64)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    // per source, start_off of doc k = sum of n_tokens of docs before it
    out.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      var acc = 0L
      sorted.foreach { case (_, _, n, start, cf, cl) =>
        assert(start == acc)
        assert(cf == start / 64)
        assert(cl == (start + n - 1) / 64)
        assert(cf <= cl)
        acc += n
      }
    }
  }

  test("sourceMix: shares sum to 1, up-weights invert the shares") {
    val out = CorpusOps.sourceMix(spark, SharedSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-2)
    val s = out.size
    out.foreach { case (_, _, _, share, w) =>
      assert(math.abs(w * share * s - 1.0) < 0.05, s"share=$share w=$w")
    }
  }

  test("repetition: a planted repetitive doc scores higher than prose") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "s", 1),
      (2L, "a quick brown fox jumps over the lazy dog", "en", "s", 1)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.repetition(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0)._4 > 0.8)  // "spam spam spam" trigram repeated
    assert(out(1)._4 == 0.0) // all trigrams unique
  }

  test("vocabCoverage: thresholds are met minimally and monotonically") {
    val out = CorpusOps.vocabCoverage(spark, SharedSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).sameElements(Array(50L, 90L, 95L, 99L)))
    // coverage at each row meets its threshold
    out.foreach { case (pct, _, _, cov) => assert(cov * 100 >= pct - 0.01) }
    // vocab sizes and coverage grow with the threshold
    assert(out.map(_._2).sameElements(out.map(_._2).sorted))
    // minimality: one fewer token drops below the threshold (recompute
    // cumulative sums directly)
    val counts = spark.read.parquet(s"${SharedSpark.sf}/documents.parquet")
      .select(explode(split($"text", " ")).as("t")).filter(length($"t") > 0)
      .groupBy("t").count().as[(String, Long)].collect()
      .sortBy { case (t, n) => (-n, t) }.map(_._2)
    val total = counts.sum
    val cum = counts.scanLeft(0L)(_ + _).drop(1)
    out.foreach { case (pct, vs, covered, _) =>
      assert(cum(vs.toInt - 1) == covered)
      assert(cum(vs.toInt - 1) * 100 >= pct * total)
      if (vs > 1) assert(cum(vs.toInt - 2) * 100 < pct * total)
    }
  }

  test("novelty: rare share is exact on a constructed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nov_").toString
    // "a b" appears 3x (common at rareMax=2 means cnt<=2 → 3x is NOT rare);
    // "b z" / "z q" appear once each (rare)
    Seq(
      (1L, "a b z q", "en", "s", 1),   // bigrams: a-b, b-z, z-q → 1 common, 2 rare
      (2L, "a b", "en", "s", 1),       // a-b → common
      (3L, "a b", "en", "s", 1)        // a-b → common
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.novelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, 2L, 666L)))  // 2/3 rare → floor(666.6)
    assert(out(1) == ((2L, 1L, 0L, 0L)))
    assert(out(2) == ((3L, 1L, 0L, 0L)))
  }

  test("temperatureMix: weights are sqrt-damped and normalized") {
    val out = CorpusOps.temperatureMix(spark, SharedSpark.sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(math.abs(out.map(_._3).sum - 1.0) < 0.01)
    assert(math.abs(out.map(_._4).sum - 1.0) < 0.01)
    // damping: every below-average source gains weight, above-average loses
    val meanShare = 1.0 / out.length
    out.foreach { case (_, _, share, w, _) =>
      if (share < meanShare * 0.9) assert(w > share)
      if (share > meanShare * 1.1) assert(w < share)
    }
    // expected tokens preserve the total (up to per-source floor loss)
    val total = out.map(_._2).sum
    val expected = out.map(_._5).sum
    assert(expected <= total && expected > total - out.length)
  }

  test("chunkDocuments: stride overlap and exact reconstruction") {
    val out = CorpusOps.chunkDocuments(spark, SharedSpark.sf, chunk = 64, stride = 48)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    val docs = spark.read.parquet(s"${SharedSpark.sf}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      // starts advance by exactly the stride; lengths are true lengths
      assert(sorted.map(_._2).toSeq == sorted.indices.map(i => 1L + 48L * i))
      sorted.foreach { case (_, st, text, n) =>
        val expect = toks.slice(st.toInt - 1, st.toInt - 1 + 64)
        assert(text == expect.mkString(" ") && n == expect.length)
      }
      // non-overlapping prefixes of consecutive chunks reconstruct the doc
      val rebuilt = sorted.flatMap { case (_, st, text, _) =>
        text.split(" ").take(48) }.take(toks.length)
      assert(rebuilt.sameElements(toks.take(rebuilt.length)))
      assert(sorted.last._2 + sorted.last._4 - 1 == toks.length)
    }
  }

  test("decontaminate: flags only docs overlapping the benchmark slice") {
    val flagged = CorpusOps.decontaminate(spark, SharedSpark.sf)
      .as[(Long, Long)].collect()
    assert(flagged.nonEmpty) // planted cross-source near-dups exist
    assert(flagged.forall(_._2 > 0))
    // no flagged doc is itself in the benchmark slice (src0)
    val src0 = spark.read.parquet(s"${SharedSpark.sf}/documents.parquet")
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    assert(flagged.forall(f => !src0.contains(f._1)))
  }

  test("trainingCorpus: survivors are unique, quality-banded, decontaminated, packed") {
    val out = graft.operators.Pipeline.trainingCorpus(spark, SharedSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every survivor within the token band
    assert(out.forall(r => r._3 >= 10 && r._3 <= 1000))
    // no exact duplicates among survivors (normalized fingerprints unique)
    val docs = spark.read.parquet(s"${SharedSpark.sf}/documents.parquet")
    val kept = out.map(_._1).toSet
    val fps = docs.filter($"doc_id".isin(kept.toSeq: _*))
      .select(md5(regexp_replace(lower($"text"), "\\s+", " "))).as[String].collect()
    assert(fps.distinct.length == fps.length)
    // no contaminated survivors
    val contaminated = graft.operators.CorpusOps.decontaminate(spark, SharedSpark.sf)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(contaminated).isEmpty)
    // offsets form a valid per-source prefix sum
    out.groupBy(_._2).foreach { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._1).foreach { r => assert(r._4 == acc); acc += r._3 }
    }
  }

  test("Scrub.redact replaces email/phone/ip and counts them") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@corp.io or call 555-123-4567"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 up"),
      (3L, "clean text only")).toDF("id", "text")
    val red = Scrub.redactDocuments(df, "id", "text")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(red(0)._2 == "mail me at <EMAIL> or call <PHONE>")
    assert(red(0)._3 == 1 && red(0)._4 == 1 && red(0)._5 == 0)
    assert(red(1)._2 == "server at <IP> and <IP> up")
    assert(red(1)._5 == 2)
    assert(red(2)._2 == "clean text only")
    val rep = Scrub.report(df, "text").as[(String, Long, Long)].collect()
    assert(rep.toSeq == Seq(("email", 1L, 1L), ("ipv4", 1L, 2L), ("phone", 1L, 1L)))
  }
}
