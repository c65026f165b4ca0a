package graft

import graft.operators.{Cdc, CorpusOps, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the CDC pair (merge apply, snapshot diff), PageRank, and the
  * histogram-quantile / source-cap corpus utilities.
  */
class CdcGraphSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("mergeUpsert: deletes gone, inserts added, updates shifted by +100") {
    val base = spark.read.parquet(SharedSpark.sf + "/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        substring(md5(col("o_orderkey").cast("string")), 1, 1).as("b"))
      .as[(Long, Double, String)].collect()
    val out = Cdc.mergeUpsert(spark, SharedSpark.sf)
      .select("o_orderkey", "o_totalprice", "applied")
      .as[(Long, Double, String)].collect()
    val byKey = out.map(r => r._1 -> r).toMap
    assert(out.length == byKey.size, "merge output keys must be unique")
    // insert offset = max(o_orderkey)+1, derived from the live keyspace
    val insOff = base.map(_._1).max + 1L
    val nDel = base.count(_._3 == "2")
    val nIns = base.count(_._3 == "3")
    assert(out.length == base.length - nDel + nIns)
    base.foreach { case (k, price, b) =>
      b match {
        case "2" => assert(!byKey.contains(k))
        case "0" | "1" =>
          assert(byKey(k)._2 == price + 100.0 && byKey(k)._3 == "update")
        case _ =>
          assert(byKey(k)._2 == price && byKey(k)._3 == "base")
      }
      if (b == "3")
        assert(byKey(k + insOff)._3 == "insert")
    }
  }

  test("snapshotDiff: classes partition exactly along the md5 buckets") {
    val buckets = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("b"))
      .as[(Long, String)].collect().toMap
    val out = Cdc.snapshotDiff(spark, SharedSpark.sf)
      .as[(Long, String)].collect()
    // clone offset = max(doc_id)+1, derived from the live keyspace
    val cloneOff = buckets.keys.max + 1L
    out.foreach { case (id, change) =>
      change match {
        case "removed" => assert(buckets(id) == "0")
        case "changed" => assert(buckets(id) == "1")
        case "added"   => assert(buckets(id - cloneOff) == "2")
      }
    }
    assert(out.count(_._2 == "removed") == buckets.values.count(_ == "0"))
    assert(out.count(_._2 == "changed") == buckets.values.count(_ == "1"))
    assert(out.count(_._2 == "added") == buckets.values.count(_ == "2"))
  }

  test("bucketed CDC base: q87b/q93b ≡ plain forms; base-side exchange gone, q93b fully exchange-free") {
    val sf = SharedSpark.sf
    // result equivalence (both outputs totally ordered on a unique key)
    assert(Cdc.mergeUpsertBucketed(spark, sf).collect().map(_.toSeq) ===
      Cdc.mergeUpsert(spark, sf).collect().map(_.toSeq))
    assert(Cdc.incrementalAggBucketed(spark, sf).collect().map(_.toSeq) ===
      Cdc.incrementalAgg(spark, sf).collect().map(_.toSeq))
    // plan shape, in the shuffle-join regime (tiny SF would broadcast)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // q93b: aggs and merge join all inherit the bucketed scan's
      // partitioning — ZERO hash exchanges (the final orderBy's range
      // exchange is the only shuffle in the whole plan)
      val planAgg = Cdc.incrementalAggBucketed(spark, sf)
        .queryExecution.executedPlan.toString
      assert(planAgg.contains("Bucketed: true"), planAgg.take(2000))
      assert(!planAgg.contains("Exchange hashpartitioning"), planAgg.take(3000))
      // q87b: the base side of the full-outer MERGE join reads bucketed;
      // only the feed side exchanges (exactly one hash exchange)
      val planMerge = Cdc.mergeUpsertBucketed(spark, sf)
        .queryExecution.executedPlan.toString
      assert(planMerge.contains("Bucketed: true"), planMerge.take(2000))
      assert("Exchange hashpartitioning".r.findAllIn(planMerge).length === 1,
        planMerge.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("pageRank: ranks positive, deterministic across runs, respects k") {
    val a = Graph.pageRank(spark, SharedSpark.sf, iters = 2, k = 20)
      .as[(Long, Long)].collect()
    val b = Graph.pageRank(spark, SharedSpark.sf, iters = 2, k = 20)
      .as[(Long, Long)].collect()
    assert(a.sameElements(b), "two runs must be bit-identical")
    assert(a.length == 20)
    assert(a.forall(_._2 >= 150000L), "every rank >= the base mass")
    assert(a.map(_._2).sameElements(a.map(_._2).sorted.reverse))
  }

  test("pageRank under a RELIABLE checkpoint dir is identical to the localCheckpoint default") {
    val base = Graph.pageRank(spark, SharedSpark.sf, iters = 2, k = 20)
      .collect().map(_.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_")
    dir.toFile.deleteOnExit()
    spark.conf.set(Lineage.ConfKey, dir.toString)
    try {
      val reliable = Graph.pageRank(spark, SharedSpark.sf, iters = 2, k = 20)
        .collect().map(_.toSeq)
      assert(reliable === base)
      // the dial actually engaged: checkpoint files landed under the dir
      import scala.jdk.CollectionConverters._
      val entries = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => java.nio.file.Files.isRegularFile(p))
      assert(entries > 0, "no reliable-checkpoint files written")
      // the session reuses ONE setCheckpointDir subdir across truncate
      // calls: the parent comparison must match the fs-qualified URI
      // sc.getCheckpointDir returns (round-4 advice: java.nio Paths choke
      // on non-local URIs, re-spawning a subdir per iteration)
      val ls = java.nio.file.Files.list(dir)
      val subdirs = try ls.iterator().asScala.count(_ => true) finally ls.close()
      assert(subdirs === 1, s"expected one reused checkpoint subdir, got $subdirs")
    } finally spark.conf.unset(Lineage.ConfKey)
  }

  test("pageRank: 0 iterations preserves the uniform start") {
    val r = Graph.pageRank(spark, SharedSpark.sf, iters = 0, k = 5)
      .as[(Long, Long)].collect()
    assert(r.forall(_._2 == 1000000L))
  }

  test("sourceCap: per-source sizes capped; members are the longest docs") {
    val k = 7
    val out = CorpusOps.sourceCap(spark, SharedSpark.sf, k = k)
      .as[(String, Long, Long, Long)].collect()
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val got = out.filter(_._1 == src)
      assert(got.length == math.min(k, rows.length))
      val expect = rows.sortBy(r => (-r._3, r._2)).take(k).map(_._2).toSet
      assert(got.map(_._2).toSet == expect)
      assert(got.map(_._4).sorted.sameElements(1L to got.length))
    }
  }

  test("streamMergeApply: state-store apply lands on the batch MERGE table") {
    val batch = Cdc.mergeUpsert(spark, SharedSpark.sf)
      .as[(Long, Long, Double, String)].collect()
    val streamed = graft.streaming.StreamOps.streamMergeApply(spark, SharedSpark.sf)
      .as[(Long, Long, Double, String)].collect()
    if (!streamed.sortBy(_._1).sameElements(batch.sortBy(_._1))) {
      val bm = batch.map(x => x._1 -> x).toMap
      val sm = streamed.groupBy(_._1)
      info(s"batch=${batch.length} streamed=${streamed.length}")
      info("dupkeys=" + sm.filter(_._2.length > 1).take(3))
      info("missing=" + batch.filter(b => !sm.contains(b._1)).take(3).mkString(","))
      info("extra=" + streamed.filter(x => !bm.contains(x._1)).take(3).mkString(","))
      info("diff=" + streamed.filter(x => bm.get(x._1).exists(_ != x)).take(3).mkString(","))
    }
    assert(streamed.sortBy(_._1).sameElements(batch.sortBy(_._1)))
  }

  test("checkpointed CDC apply: seed paid once, warm passes delta-sized") {
    import graft.streaming.StreamOps
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_spec").toString
    val orders = Tables.orders(spark, SharedSpark.sf)
    // pass 1 (cold): seeds the store from the base table, applies feed 1;
    // emissions must equal the batch MERGE's touched (non-base) rows
    val feed1 = Cdc.changeFeed(orders)
    val (u1, e1) = StreamOps.cdcApplyPass(spark, SharedSpark.sf, work, Some(feed1))
    val expected1 = Cdc.mergeUpsert(spark, SharedSpark.sf)
      .filter(col("applied") =!= "base")
      .as[(Long, Long, Double, String)].collect().sortBy(_._1)
    val got1 = e1.as[(Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got1.sameElements(expected1))
    // pass 2 (warm): 50 fresh updates on keys feed 1 never touched —
    // the checkpoint restores the state, initialState must NOT re-seed
    val feed2 = orders
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) > "3")
      .orderBy("o_orderkey").limit(50)
      .select(col("o_orderkey").as("k"), lit("U").as("op"),
        col("o_custkey").as("c_ck"), (col("o_totalprice") + 7.0).as("c_price"))
    val exp2 = feed2.as[(Long, String, Long, Double)].collect()
      .map { case (k, _, ck, p) => (k, ck, p, "update") }.sortBy(_._1)
    val (u2, e2) = StreamOps.cdcApplyPass(spark, SharedSpark.sf, work, Some(feed2))
    val got2 = e2.as[(Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got2.sameElements(exp2))
    assert(u2 <= 50L, s"warm pass wrote $u2 state rows — it re-seeded")
    assert(u1 > u2, s"cold pass wrote $u1 rows, warm $u2")
    // pass 3: no new feed files → no emissions, no state writes
    val (u3, e3) = StreamOps.cdcApplyPass(spark, SharedSpark.sf, work, None)
    assert(u3 === 0L)
    assert(e3.count() === 0L)
  }

  test("incrementalAgg: base ⊕ delta equals the full recompute, bit-exact") {
    val out = Cdc.incrementalAgg(spark, SharedSpark.sf)
      .as[(Long, Long, Double)].collect()
    val full = spark.read.parquet(SharedSpark.sf + "/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 1e4).cast("long")
          .cast("decimal(38,0)")).cast("double") / 1e4).as("rev"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.sortBy(_._1).sameElements(full))
  }

  test("applyMix: copy counts differ from exact weight by less than 1") {
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
    val perSource = docs.groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    val copies = CorpusOps.applyMix(spark, SharedSpark.sf)
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    // every doc gets floor(w) or floor(w)+1 copies, so per-source totals
    // are within nDocs of nDocs*w; with w >= ~0.5 here, just sanity-bound
    perSource.foreach { case (src, n) =>
      val c = copies.getOrElse(src, 0L)
      assert(c >= 0 && c <= 20 * n, s"$src copies=$c docs=$n")
    }
    // deterministic across runs
    val again = CorpusOps.applyMix(spark, SharedSpark.sf)
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    assert(again == copies)
  }

  test("outliers: integer flags match the float z-score test away from ties") {
    val out = graft.operators.Profiler.outliers(spark, SharedSpark.sf)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val xs = rows.map(_._3.toDouble)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val variance = xs.map(x => (x - mu) * (x - mu)).sum / n
      rows.foreach { case (_, id, x) =>
        val z2 = (x - mu) * (x - mu) / variance
        // float check is only advisory near the boundary; the operator's
        // integer test is the ground truth there
        if (z2 > 4.001) assert(out.contains((src, id)), s"$src/$id z2=$z2")
        if (z2 < 3.999) assert(!out.contains((src, id)), s"$src/$id z2=$z2")
      }
    }
  }

  test("riAudit: clean star schema has zero orphans; row counts match") {
    val rows = graft.operators.QualityGate.riAudit(spark, SharedSpark.sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 5)
    assert(rows.forall(_._3 == 0L), s"orphans found: ${rows.mkString(",")}")
    val li = spark.read.parquet(SharedSpark.sf + "/lineitem.parquet").count()
    assert(rows.filter(_._1.startsWith("lineitem")).forall(_._2 == li))
  }

  test("groupSample: k per source, uniform in doc_id (md5 rank), stable") {
    val out = CorpusOps.groupSample(spark, SharedSpark.sf, k = 5)
      .as[(String, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    bySrc.foreach { case (src, rows) =>
      assert(rows.length == math.min(5L, docs(src)))
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    val again = CorpusOps.groupSample(spark, SharedSpark.sf, k = 5)
      .as[(String, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._3)).sameElements(out.sortBy(r => (r._1, r._3))))
  }

  test("fuzzyPairs: canonical, within threshold, complete for one brand") {
    val out = graft.operators.TextAnalysis.fuzzyPairs(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(p => p._1 < p._2 && p._3 <= 2))
    // brute-force one brand and compare exactly
    val parts = spark.read.parquet(SharedSpark.sf + "/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .as[(Long, String, String)].collect()
    val brand = parts.head._2
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val in = parts.filter(_._2 == brand)
    val expect = (for {
      x <- in; y <- in if x._1 < y._1
      d = lev(x._3, y._3) if d <= 2
    } yield (x._1, y._1, d.toLong)).toSet
    val inKeys = in.map(_._1).toSet
    assert(out.filter(p => inKeys(p._1) && inKeys(p._2)).toSet == expect)
  }

  test("fuzzyClusters: pair-connected parts share a keeper; keepers minimal") {
    val keeper = graft.operators.TextAnalysis.fuzzyClusters(spark, SharedSpark.sf)
      .as[(Long, Long)].collect().toMap
    assert(keeper.forall { case (k, rep) => rep <= k })
    assert(keeper.values.toSet.forall(rep => keeper(rep) == rep),
      "a keeper must be its own keeper")
    val pairs = graft.operators.TextAnalysis.fuzzyPairs(spark, SharedSpark.sf)
      .as[(Long, Long, Long)].collect()
    pairs.foreach { case (a, b, _) =>
      assert(keeper(a) == keeper(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("tolerantParse: accepted + rejected = total; bad slice is bucket 0") {
    val rows = graft.operators.EventOps.tolerantParse(spark, SharedSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, ok, bad, _) => assert(ok + bad == n) }
    val events = Tables.events(spark, SharedSpark.sf)
      .select(col("event_id")).as[Long].collect()
    val expectBad = events.count(id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString.head == '0')
    assert(rows.map(_._4).sum == expectBad)
  }

  test("splitCorpus: splits partition the corpus, ratios near 90/5/5") {
    val rows = CorpusOps.splitCorpus(spark, SharedSpark.sf)
      .as[(String, String, Long, Long)].collect()
    val total = spark.read.parquet(SharedSpark.sf + "/documents.parquet").count()
    assert(rows.map(_._3).sum == total, "every doc lands in exactly one split")
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    assert(bySplit("train").toDouble / total > 0.8)
  }

  test("keySkew: agrees with a plain groupBy count; shares are floored ppm") {
    val out = graft.operators.Profiler.keySkew(spark, SharedSpark.sf, k = 5)
      .as[(Long, Long, Long)].collect()
    val li = spark.read.parquet(SharedSpark.sf + "/lineitem.parquet")
    val total = li.count()
    val counts = li.groupBy(col("l_suppkey")).count()
      .as[(Long, Long)].collect().toMap
    assert(out.length == 5)
    out.foreach { case (key, cnt, ppm) =>
      assert(counts(key) == cnt)
      assert(ppm == cnt * 1000000L / total)
    }
    assert(out.map(_._2).sameElements(out.map(_._2).sorted.reverse))
  }

  test("histQuantiles: matches sort-based type-1 quantiles per source") {
    val out = CorpusOps.histQuantiles(spark, SharedSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(SharedSpark.sf + "/documents.parquet")
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    def q(sorted: Array[Long], num: Int, den: Int): Long =
      sorted((num.toLong * sorted.length + den - 1).toInt / den - 1)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val row = out.find(_._1 == src).get
      assert(row._2 == q(sorted, 1, 2), s"$src p50")
      assert(row._3 == q(sorted, 9, 10), s"$src p90")
      assert(row._4 == q(sorted, 99, 100), s"$src p99")
      assert(row._5 == rows.length)
    }
  }
}
