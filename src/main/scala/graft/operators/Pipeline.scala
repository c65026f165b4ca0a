package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline — the composition a user of
  * this library actually runs: quality filter → exact dedup → near-dup
  * cluster pruning → benchmark decontamination → sequence packing.
  *
  * Every stage is one of the library's tested operators; the composition
  * stays fully declarative, so Catalyst plans the whole chain (filters
  * reach the scan once, the anti-join sides broadcast at these sizes and
  * shuffle at 100 TB).
  */
object Pipeline {

  /** Assemble the cleaned, packed corpus. Returns one row per surviving
    * document: (doc_id, source, n_tokens, start_off, chunk_first).
    */
  def trainingCorpus(s: SparkSession, d: String,
                     minTokens: Int = 10, maxTokens: Int = 1000,
                     seqLen: Int = 512): DataFrame = {
    val docs = Tables.documents(s, d)

    // 1. quality gate: token-count band + non-empty (cheap, first).
    val toks = size(TextFunctions.tokens(col("text"))).cast("long")
    val quality = docs
      .withColumn("n_tokens", toks)
      .filter(col("n_tokens").between(minTokens, maxTokens))

    // 2. exact dedup: keep the min doc_id per normalized fingerprint.
    val keepExact = quality
      .withColumn("fp", md5(TextFunctions.normalize(col("text"))))
      .withColumn("keep",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("keep"))

    // 3. near-dup pruning: drop every doc whose MinHash-LSH cluster
    //    representative is a different (smaller) doc.
    val nearDupLosers = Dedup.resolveClusters(Dedup.minhashLsh(s, d))
      .filter(col("rep") =!= col("doc_id"))
      .select(col("doc_id"))

    // 4. benchmark decontamination: drop docs sharing an 8-gram with the
    //    benchmark slice.
    val contaminated = CorpusOps.decontaminate(s, d).select(col("doc_id"))

    // No broadcast hints: both drop-sets are corpus-derived and can be a
    // large fraction of the corpus on a duplicate-heavy / contaminated
    // crawl — a forced broadcast is a driver OOM at 100 TB. AQE still
    // broadcasts them at small SFs where they measure in MBs.
    val clean = keepExact
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 5. pack the survivors into fixed-length sequences per source.
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        floor((col("end_off") - col("n_tokens")) / lit(seqLen.toLong)).as("chunk_first"))
      .orderBy("doc_id")
  }
}
