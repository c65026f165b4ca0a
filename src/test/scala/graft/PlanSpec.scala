package graft

import graft.operators.{Dedup, Pipeline, Relational, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, ResolvedHint}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the scale contract: corpus-derived join sides
  * must carry NO forced broadcast hint (a driver/executor OOM at 100 TB
  * on duplicate-heavy or contaminated crawls), while AQE remains free to
  * broadcast them at test SFs where they measure in MBs — these specs
  * pin both halves so a regression in either direction fails.
  */
class PlanSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private def broadcastHints(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }.size

  test("no broadcast() hint on any corpus-derived side (dedup family, star-join fact leg)") {
    assert(broadcastHints(Dedup.dedupedDocuments(spark, sf)) === 0)
    assert(broadcastHints(Dedup.minhashLsh(spark, sf)) === 0)
    assert(broadcastHints(Dedup.ngramJaccard(spark, sf)) === 0)
    assert(broadcastHints(Dedup.minhashApprox(spark, sf)) === 0)
    // q44's df side is the corpus-derived vocabulary — same class: an
    // open-vocab crawl's distinct-token table is tens of GB, no hint
    assert(broadcastHints(TextAnalysis.tfidf(spark, sf)) === 0)
    // trainingCorpus embeds decontamination, whose BENCHMARK shingle set
    // is the one provably-bounded side allowed to keep its hint
    assert(broadcastHints(Pipeline.trainingCorpus(spark, sf)) === 1)
    // q04's lineitem ⋈ orders leg is fact-to-fact: only the dim subtree
    // (customer ⋈ nation ⋈ region) may be hinted, never orders
    val q04Hints = Relational.multiJoin(spark, sf).queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }
    assert(q04Hints.nonEmpty)
    assert(!q04Hints.exists(_.child.toString.contains("o_orderkey")),
      "orders (a fact table) must not carry a broadcast hint")
  }

  test("AQE still broadcasts the de-hinted anti-joins at test SF") {
    val df = Pipeline.trainingCorpus(spark, sf)
    df.count() // drive AQE to final physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected AQE-chosen broadcast anti-joins at test SF")
  }

  test("closing-session operators keep the scale contract: no forced hints") {
    assert(broadcastHints(graft.operators.Cdc.mergeUpsert(spark, sf)) === 0)
    assert(broadcastHints(graft.operators.Cdc.snapshotDiff(spark, sf)) === 0)
    assert(broadcastHints(graft.operators.Cdc.incrementalAgg(spark, sf)) === 0)
    assert(broadcastHints(graft.operators.CorpusOps.applyMix(spark, sf)) === 0)
    assert(broadcastHints(graft.operators.Profiler.outliers(spark, sf)) === 0)
    assert(broadcastHints(graft.operators.TextAnalysis.fuzzyPairs(spark, sf)) === 0)
  }

  test("TopKPerKey-routed caps plan the two-stage bounded heap (partial+final)") {
    for (df <- Seq(graft.operators.CorpusOps.sourceCap(spark, sf, k = 5),
                   graft.operators.CorpusOps.groupSample(spark, sf, k = 5))) {
      val plan = df.queryExecution.executedPlan.toString
      assert("TopKPerKey".r.findAllIn(plan).size == 2,
        "expected partial AND final TopKPerKey stages")
    }
  }

  test("fuzzy matching verifies on the distinct-name grid, not raw rows") {
    val df = graft.operators.TextAnalysis.fuzzyPairs(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    // levenshtein must apply to the deduplicated name grid, not the raw
    // self-join: every node whose expressions invoke levenshtein must
    // have (or be) a join with an Aggregate descendant on BOTH inputs —
    // i.e. both sides were reduced to distinct (block, name) rows first
    val levNodes = plan.collect {
      case p if p.expressions.exists(_.find(_.prettyName == "levenshtein").isDefined) => p
    }
    assert(levNodes.nonEmpty, "levenshtein missing from the optimized plan")
    val joins = levNodes.flatMap(_.collect { case j: Join => j })
    assert(joins.nonEmpty, "levenshtein is not applied at/above a join")
    assert(joins.forall { j =>
      j.left.collectFirst { case a: Aggregate => a }.nonEmpty &&
      j.right.collectFirst { case a: Aggregate => a }.nonEmpty
    }, "levenshtein join must take distinct-name aggregates on both inputs")
  }
}
