package graft

import graft.operators.{CorpusOps, Dedup, PrefixSum, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-selection family: the distributed prefix-sum
  * utility, token-budget selection (q109), boilerplate strip (q110),
  * per-source score calibration (q111), token entropy (q112).
  */
class CorpusSelectionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("prefixSum: equals the single-partition window on every row, many partitions") {
    val df = Tables.documents(spark, SharedSpark.sf)
      .select(col("doc_id"), col("n_chars"))
    val got = PrefixSum.withRunningTotal(
      df, Seq(col("doc_id").asc), col("n_chars"), "cum", partitions = 7)
    // the utility must NOT collapse to one partition — that is the whole point
    assert(got.rdd.getNumPartitions == 7)
    val naive = df.withColumn("cum",
      sum(col("n_chars")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val g = got.select("doc_id", "cum").as[(Long, Long)].collect().toMap
    val e = naive.select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(g == e)
  }

  test("prefixSum: descending order key and re-run determinism") {
    val df = Tables.documents(spark, SharedSpark.sf)
      .select(col("doc_id"), col("n_chars"))
    def run() = PrefixSum.withRunningTotal(
      df, Seq(col("n_chars").desc, col("doc_id").asc), col("n_chars"), "cum",
      partitions = 5).select("doc_id", "cum").as[(Long, Long)].collect().toMap
    val a = run()
    val b = run()
    assert(a == b) // boundary sampling may differ; cumulative values may not
    val total = df.agg(sum("n_chars")).as[Long].head()
    assert(a.values.max == total)
  }

  test("q109 tokenBudget: kept set is the exact greedy prefix of half the mass") {
    val out = CorpusOps.tokenBudget(spark, SharedSpark.sf)
      .select("doc_id", "n_tokens", "score_ppm", "cum_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // reconstruct the greedy order locally and check prefix-exactness
    val all = CorpusOps.stopwordPpm(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
      .sortBy { case (id, _, ppm) => (-ppm, id) }
    val total = all.map(_._2).sum
    val budget = total / 2
    var cum = 0L
    val expect = all.takeWhile { case (_, n, _) => { cum += n; cum <= budget } }
    assert(out.map(_._1).sorted.toSeq == expect.map(_._1).sorted.toSeq)
    assert(out.map(_._4).max <= budget)
  }

  test("q110 boilerplateStrip: no survivor repeats, all-boilerplate docs vanish") {
    val sf = SharedSpark.sf
    val out = Dedup.boilerplateStrip(spark, sf)
    // survivors: re-window the reassembled texts — every 20-token
    // paragraph in the OUTPUT must be corpus-unique in the INPUT
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    def paras(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), explode(sequence(lit(1), size(col("ts")), lit(20))).as("st"),
        col("ts"))
      .select(col("doc_id"), array_join(slice(col("ts"), col("st"), lit(20)), " ").as("p"))
    val inputFreq = paras(Tables.documents(spark, sf))
      .groupBy("p").count().as[(String, Long)].collect().toMap
    val survivors = paras(out.select(col("doc_id"), col("text"))).as[(Long, String)].collect()
    assert(survivors.nonEmpty)
    assert(survivors.forall { case (_, p) => inputFreq(p) == 1L })
    // kept-paragraph accounting: n_kept sums to the unique-paragraph count
    val nUnique = inputFreq.valuesIterator.count(_ == 1L)
    val keptSum = out.agg(sum("n_kept")).as[Long].head()
    assert(keptSum == nUnique)
  }

  test("q110 maxOcc=2 (anti-join path): survivors occur ≤2 times, superset of maxOcc=1") {
    val sf = SharedSpark.sf
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    def paras(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), explode(sequence(lit(1), size(col("ts")), lit(20))).as("st"),
        col("ts"))
      .select(col("doc_id"), array_join(slice(col("ts"), col("st"), lit(20)), " ").as("p"))
    val inputFreq = paras(Tables.documents(spark, sf))
      .groupBy("p").count().as[(String, Long)].collect().toMap
    val k2 = paras(Dedup.boilerplateStrip(spark, sf, maxOcc = 2)
      .select(col("doc_id"), col("text"))).as[(Long, String)].collect()
    assert(k2.nonEmpty)
    assert(k2.forall { case (_, p) => inputFreq(p) <= 2L })
    // every occurrence of a ≤2-frequency paragraph survives
    assert(k2.length == inputFreq.collect { case (_, n) if n <= 2 => n }.sum)
    // the maxOcc=1 aggregate path's survivors are exactly the freq-1 subset
    val k1 = paras(Dedup.boilerplateStrip(spark, sf)
      .select(col("doc_id"), col("text"))).as[(Long, String)].collect()
    assert(k1.map(_._2).toSet.subsetOf(k2.map(_._2).toSet))
  }

  test("q111 sourceCalibration: histogram rewrite equals the naive percent_rank window") {
    val out = CorpusOps.sourceCalibration(spark, SharedSpark.sf)
      .as[(Long, String, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._4 >= 0.75))
    val naive = CorpusOps.stopwordPpm(spark, SharedSpark.sf)
      .join(Tables.documents(spark, SharedSpark.sf).select("doc_id", "source"), "doc_id")
      .withColumn("pr", round(percent_rank().over(
        Window.partitionBy(col("source")).orderBy(col("score_ppm"))), 4))
      .filter(col("pr") >= 0.75)
      .select("doc_id", "source", "score_ppm", "pr")
      .as[(Long, String, Long, Double)].collect()
    assert(out.sortBy(_._1).toSeq == naive.sortBy(_._1).toSeq)
  }

  test("q112 tokenEntropy: bounds and closed-form extremes") {
    val out = TextAnalysis.tokenEntropy(spark, SharedSpark.sf)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // 0 <= H <= log2(n_tokens), within rounding slack
    assert(out.forall { case (_, n, h) =>
      h >= -1e-4 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-4
    })
    // closed forms on a crafted corpus written through the same reader path
    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq(
      (1L, "a a a a", "en", "src0", 7L),          // H = 0
      (2L, "a b c d", "en", "src0", 7L),          // H = log2(4) = 2
      (3L, "a a b b c c d d", "en", "src0", 15L)  // uniform over 4 → 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.tokenEntropy(spark, dir)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(m(1L) == 0.0)
    assert(m(2L) == 2.0)
    assert(m(3L) == 2.0)
  }

  test("q117 weightedSample: without replacement, deterministic, weight-biased") {
    val sel = CorpusOps.weightedSample(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(sel.length == 100)
    assert(sel.map(_._1).distinct.length == 100) // without replacement
    assert(sel.forall { case (_, w, k) => w >= 1L && k <= 0L }) // ln(u) <= 0
    val again = CorpusOps.weightedSample(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(sel.toSeq == again.toSeq) // the md5-derived keys are replayable
    // inclusion probability rises with weight: the selected docs' mean
    // weight must exceed the corpus mean (deterministic given the data)
    val corpusMeanW = Tables.documents(spark, SharedSpark.sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("doc_id")
      .agg((floor(count(when(col("t").isin(TextAnalysis.stopwords: _*), 1)) *
        lit(1000000L) / count(lit(1))) + 1L).as("w"))
      .agg(avg("w")).as[Double].head()
    val selMeanW = sel.map(_._2).sum.toDouble / sel.length
    assert(selMeanW > corpusMeanW)
  }

  test("q118 contaminationSpans: agrees with q59 per doc; grams are real 8-token spans") {
    val spans = CorpusOps.contaminationSpans(spark, SharedSpark.sf)
      .as[(Long, String, Int, Long)].collect() // doc_id, gram, first_pos, n_occ
    assert(spans.nonEmpty)
    spans.foreach { case (_, gram, pos, occ) =>
      assert(gram.split(" ").length == 8)
      assert(pos >= 0 && occ >= 1)
    }
    // the span report's per-doc distinct-gram count IS q59's n_shared
    val perDoc = spans.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val q59 = CorpusOps.decontaminate(spark, SharedSpark.sf)
      .as[(Long, Long)].collect().toMap
    assert(perDoc == q59)
  }

  test("q118b registry path: bounded regime ≡ q118 report; final plan never sort-merges") {
    // the REGISTRY entry, not a hand-built DF: the plan assertion below
    // pins the exact path the driver runs
    val explicit = SparkEntry.queries("q118b_contamination_bounded")(
      spark, SharedSpark.sf)
    // same pool, same bench content → identical report in either regime
    val viaRegistry = CorpusOps.contaminationSpans(spark, SharedSpark.sf)
    assert(explicit.collect().toSeq == viaRegistry.collect().toSeq)
    // bounded-bench regime: AQE broadcasts the MB-sized gram set from
    // measured size, so NO join in the FINAL plan sort-merges — pass A
    // is map-side and the pool grams are never exchanged for it.
    // AdaptiveSparkPlanExec.toString appends an '== Initial Plan =='
    // subtree whenever AQE re-planned; the static planner is free to
    // pick SMJ there (size estimates, not measurements) — assert on
    // the executed final subtree only.
    val plan = explicit.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
  }

  test("q119 shuffleShards: per-epoch bijection, contiguous per-shard positions, epochs differ") {
    def manifest(epoch: Int) = CorpusOps.shuffleShards(spark, SharedSpark.sf, epoch = epoch)
      .as[(Long, Int, Long)].collect()
    val e0 = manifest(0)
    val nDocs = Tables.documents(spark, SharedSpark.sf).count()
    assert(e0.length == nDocs) // a permutation: every doc, exactly once
    assert(e0.map(_._1).distinct.length == nDocs)
    assert(e0.forall { case (_, sh, _) => sh >= 0 && sh < 8 })
    // positions within each shard are exactly 1..count(shard)
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // epoch 1 is a genuinely different permutation of the same doc set
    val e1 = manifest(1)
    assert(e1.map(_._1).sorted.toSeq == e0.map(_._1).sorted.toSeq)
    assert(e1.toSeq != e0.toSeq)
    // and replayable: same epoch → identical manifest
    assert(manifest(1).toSeq == e1.toSeq)
  }

  test("q120 doremiMix: weights stay a (floored) distribution and tilt toward excess loss") {
    val rows = CorpusOps.doremiMix(spark, SharedSpark.sf)
      .as[(Int, String, Long, Long)].collect()
    val iters = rows.map(_._1).distinct.sorted
    assert(iters.sameElements(Array(1, 2, 3)))
    val byIter = rows.groupBy(_._1)
    val nd = byIter(1).length
    byIter.values.foreach { rs =>
      // floor-division renormalization + smoothing can only LOSE ppm
      val tot = rs.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - 100L * nd, s"sum=$tot")
      assert(rs.forall(_._4 > 0L)) // smoothing floors every domain above 0
    }
    // the max-excess domain's weight is non-decreasing across iterations
    // (it holds the largest multiplicative factor), and beats uniform
    val maxSrc = byIter(1).maxBy(r => (r._3, r._2))._2
    val ws = iters.map(i => byIter(i).find(_._2 == maxSrc).get._4)
    assert(ws.sliding(2).forall { case Array(a, b) => b >= a })
    if (byIter(1).map(_._3).distinct.length > 1) // non-degenerate losses
      assert(ws.last > 1000000L / nd)
    // deterministic end to end
    val again = CorpusOps.doremiMix(spark, SharedSpark.sf)
      .as[(Int, String, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("q121 ccnetBuckets: full coverage, monotone tercile boundaries per source") {
    val rows = CorpusOps.ccnetBuckets(spark, SharedSpark.sf)
      .as[(Long, String, Long, String)].collect()
    // covers exactly the lm-scored docs (≥ 1 bigram), one bucket each
    assert(rows.length == CorpusOps.lmScore(spark, SharedSpark.sf).count())
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => Set("head", "middle", "tail").contains(r._4)))
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byB = rs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // head holds the most-likely text: every head score ≥ every middle
      // score ≥ every tail score (value-level buckets make this strict
      // in the sense of no interleaving)
      for {
        h <- byB.get("head"); m <- byB.get("middle")
      } assert(h.min >= m.max)
      for {
        m <- byB.get("middle"); t <- byB.get("tail")
      } assert(m.min >= t.max)
      assert(byB.contains("head")) // the top value is always head
    }
    val again = CorpusOps.ccnetBuckets(spark, SharedSpark.sf)
      .as[(Long, String, Long, String)].collect()
    assert(rows.toSeq == again.toSeq)
  }
}
