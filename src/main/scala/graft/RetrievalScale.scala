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
  * Usage: runMain graft.RetrievalScale <sfDir> [nAppends] [batchRows] [reps]
  */
object RetrievalScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nAppends = args.lift(1).map(_.toInt).getOrElse(6)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(50000)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    s.sparkContext.setLogLevel("WARN")

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
        val row = operators.Retrieval.bm25Indexed(s, dir)
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

    timed("build")(operators.Retrieval.buildIndex(s, dir))
    println(s"[retrieval-scale] postings files fresh = ${postingsFiles()}")
    probe("fresh")

    // nAppends=0 → build + probe only (the 50 M-doc "probe latency vs
    // corpus size" point, where a full compact rewrite would just
    // re-measure the build).
    if (nAppends == 0) { s.stop(); return }
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
