package graft

import org.apache.spark.sql.SparkSession

/** Measures q80's cells dial: within-cluster pairing costs Σ n_c², so
  * cells must track corpus size (Similarity.cellsFor). Usage:
  *   runMain graft.SemDedupScale <sfDir> [cells,cells,...]
  * Prints seconds and dropped-row count per setting (different cells =
  * different clusterings, so counts legitimately differ — the claim
  * under test is the cost curve, not output equality).
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(8, 32, 64))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm with the LARGEST cell count (cheapest pair join — a small
    // fixed count would be the quadratic case at big corpora)
    operators.Similarity.semDedup(spark, sfDir, cells = ks.max).count()
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val n = operators.Similarity.semDedup(spark, sfDir, cells = k).count()
      println(f"[semdedup-scale] sf=$sfDir cells=$k dropped=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
