package graft

import org.apache.spark.sql.SparkSession

/** Measures BPE merge-count scaling (SURVEY round-3 seed): q77's cost
  * model says each merge iteration is a pair-count over the DISTINCT-WORD
  * table plus a row-local merge fold, so time should be ~linear in k and
  * ~flat in corpus size once the vocab table is built. Usage:
  *   runMain graft.BpeScale <sfDir> [k,k,...] [batch,batch,...]
  * Prints one line per (k, batch): seconds and merges produced. A third
  * arg measures the batched trainer at those batch sizes (batch=1 is the
  * exact sequential path).
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(8, 32, 64))
    val batches = args.lift(2).map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM + parquet footers so k-scaling isn't startup noise
    operators.TextAnalysis.bpeMerges(spark, sfDir, 2).count()
    for (k <- ks; b <- batches) {
      val t0 = System.nanoTime()
      val n =
        if (b == 1) operators.TextAnalysis.bpeMerges(spark, sfDir, k).count()
        else operators.TextAnalysis.bpeMergesBatched(spark, sfDir, k, b).count()
      println(f"[bpe-scale] sf=$sfDir k=$k batch=$b merges=$n " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
