package graft

import org.apache.spark.sql.functions._

/** Lifecycle measurement for the persisted BM25 inverted index (q113b):
  * probe latency over a FRESH index, after N appended crawl batches
  * (each append lands one small file set per bucket), and after
  * [[graft.operators.Retrieval.compact]] folds the buckets back to one
  * file each. The LshIndex got this treatment in round 4; this is the
  * lexical sibling's turn (round-5 judge ask #5). Reports the postings
  * file count at each stage so the small-files growth and the
  * compaction payoff are visible next to the latencies.
  *
  * Appended batches are doc_id-shifted corpus slices: fresh ids, so
  * every append is a REAL fold (not an idempotent skip), with realistic
  * text and term distributions.
  *
  * The append lifecycle runs against a SCRATCH COPY of the corpus dir,
  * never the shared one: round 6 ran the appends against the shared
  * sf0.01 dir and its persisted index then held three phantom docs the
  * corpus does not — the q113b oracle regression. (The registry path
  * now also validates corpus-equivalence at reattach, but a measurement
  * tool must not mutate shared state in the first place.) Probes pass
  * `validateCorpus = false`: measuring an appended-to index is the
  * point here, and the lifecycle contract is "answer over whatever the
  * index holds".
  *
  * With nAppends=0 (the 50 M-doc probe-latency point) the run is
  * non-mutating and uses the given dir directly, and measures the
  * compact-right-after-build deployment rule the round-6 campaign
  * motivated: fresh build lands tasks×buckets files; compact folds them
  * to one per bucket and cut probes 7-9× at 5 M docs.
  *
  * Usage: runMain graft.RetrievalScale <sfDir> [nAppends] [batchRows] [reps]
  * Special nAppends values: 0 = non-mutating build/compact/probe point;
  * -1 = reattach pricing (run in a fresh JVM after a build run —
  * reattach, first validated registry probe, memoized steady probe).
  */
object RetrievalScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val nAppends = args.lift(1).map(_.toInt).getOrElse(6)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(50000)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    s.sparkContext.setLogLevel("WARN")

    // append lifecycle mutates its index: work on a scratch corpus copy.
    // The non-mutating modes (0 = build/compact/probe, -1 = reattach
    // pricing) use the dir directly — the -1 mode MUST, or the path
    // digest rolls and there is no index to reattach (round-8 find: the
    // first -1 run copied to scratch and silently re-measured a build).
    val dir =
      if (nAppends <= 0) srcDir
      else {
        val t = java.nio.file.Files.createTempDirectory("graft_retrscale_")
        t.toFile.deleteOnExit()
        WarehouseGC.registerScratchPurge(s, t.toString) // scratch index lineage dies with the JVM
        val from = java.nio.file.Paths.get(srcDir, "documents.parquet")
        val to = t.resolve("documents.parquet")
        java.nio.file.Files.createDirectories(to)
        val walk = java.nio.file.Files.walk(from)
        try walk.filter(java.nio.file.Files.isRegularFile(_)).forEach { f =>
          java.nio.file.Files.copy(f, to.resolve(from.relativize(f)))
        } finally walk.close()
        println(s"[retrieval-scale] scratch corpus copy: $t")
        t.toString
      }

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[retrieval-scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      System.gc()
    }
    def probe(stage: String): Unit = (1 to reps).foreach { r =>
      timed(s"probe_$stage rep$r") {
        // count() alone would let Catalyst prune the scoring columns;
        // the checksum forces the full BM25 arithmetic like the oracle.
        val row = operators.Retrieval.bm25Indexed(s, dir, validateCorpus = false)
          .agg(round(sum(col("score")), 4).as("chk"), count(lit(1)).as("n"))
          .collect()(0)
        println(s"[retrieval-scale]   chk=${row.get(0)} n=${row.getLong(1)}")
      }
    }
    def postingsFiles(): Long = {
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
      val p = java.nio.file.Paths.get(wh, operators.Retrieval.tbl("postings", dir))
      val walk = java.nio.file.Files.walk(p)
      try walk.filter(f => f.toString.endsWith(".parquet")).count()
      finally walk.close()
    }

    // nAppends=-1 → reattach pricing, run in a FRESH JVM after a build
    // run: re-registering the surviving index (no rebuild), the
    // once-per-JVM corpus-equivalence validation the registry contract
    // pays on its first probe, and the memoized steady probe. These are
    // the numbers round 7 measured by hand in sbt console; this mode
    // gives them committed script provenance (round-7 ADVICE).
    if (nAppends < 0) {
      // reattachOrFail, not buildIndex: with no surviving generation
      // (wrong run order, stamp rolled) buildIndex would silently do a
      // FULL build and this mode would record it as 'reattach' — abort
      // loudly instead (round-8 advice)
      timed("reattach")(operators.Retrieval.reattachOrFail(s, dir))
      def validatedProbe(stage: String): Unit = timed(s"registry_probe_$stage") {
        val row = operators.Retrieval.bm25Indexed(s, dir) // validateCorpus=true
          .agg(round(sum(col("score")), 4).as("chk"), count(lit(1)).as("n"))
          .collect()(0)
        println(s"[retrieval-scale]   chk=${row.get(0)} n=${row.getLong(1)}")
      }
      validatedProbe("first") // pays ensureCorpusExact's two id scans
      validatedProbe("steady") // memoized: index-only probe
      s.stop(); return
    }

    timed("build")(operators.Retrieval.buildIndex(s, dir))
    println(s"[retrieval-scale] postings files fresh = ${postingsFiles()}")
    probe("fresh")

    // nAppends=0 → build + probe + compact-after-build + probe: the
    // 50 M-doc "probe latency vs corpus size" point plus the deployment
    // rule's payoff, with no mutation of the shared dir's doc set.
    if (nAppends == 0) {
      timed("compact_after_build")(operators.Retrieval.compact(s, dir))
      println(s"[retrieval-scale] postings files after compact = ${postingsFiles()}")
      probe("compacted_fresh")
      s.stop(); return
    }
    (1 to nAppends).foreach { i =>
      // shift ids far past any real doc_id so the batch is uncommitted
      val batch = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(997)) === i) // spread across input files
        .limit(batchRows)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L) * i)
      timed(s"append$i (${batchRows} docs)")(
        operators.Retrieval.append(s, batch, dir))
    }
    println(s"[retrieval-scale] postings files after $nAppends appends = ${postingsFiles()}")
    probe("appended")

    timed("compact")(operators.Retrieval.compact(s, dir))
    println(s"[retrieval-scale] postings files after compact = ${postingsFiles()}")
    probe("compacted")
    s.stop()
  }
}
