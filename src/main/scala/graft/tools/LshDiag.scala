package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Diagnostic main: stage-by-stage cardinalities of the minhash-LSH
  * pipeline at a given dir — bucket-size histogram of the band join so a
  * candidate-pair explosion is visible BEFORE the join runs.
  * Usage: runMain graft.tools.LshDiag <sfDir>
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(s, d)
    println(s"[diag] docs=${docs.count()}")
    val sig = Dedup.signaturesRowLevel(docs)
    println(s"[diag] sigs=${sig.count()}")
    val bands = Dedup.bandsOf(sig)
    // bucket-size histogram: candidate pairs = sum over buckets of n*(n-1)/2
    val hist = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("buckets"))
      .orderBy(col("n").desc)
    val top = hist.limit(30).collect()
    println("[diag] top bucket sizes (n, buckets):")
    top.foreach(r => println(s"[diag]   n=${r.getLong(0)} buckets=${r.getLong(1)}"))
    // coalesce: with no bucket >1 member, hist is empty and sum() is NULL —
    // report 0 candidate pairs instead of NPE-ing on getLong (ADVICE r5).
    val pairs = hist.select(coalesce(
      sum(col("n") * (col("n") - 1) / 2 * col("buckets")), lit(0)).cast("long"))
      .collect()(0).getLong(0)
    println(s"[diag] raw candidate pairs (pre-dedup) = $pairs")
    s.stop()
  }
}
