package graft

import org.apache.spark.sql.functions._

/** Honest scale measurement for the manifest-shaped selection queries —
  * q119 in particular: Bench times `fn(...).count()`, and for a query
  * whose payload is a window column (shard POSITION) Catalyst's column
  * pruning correctly drops the unused window before counting, so the
  * Bench number measures a corpus count, not the manifest. This main
  * forces every output column with a checksum aggregate instead.
  *
  * Usage: runMain graft.SelectionScale <sfDir> [reps]
  */
object SelectionScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    s.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      // sum(pos) + count force the row_number window and the full
      // manifest cardinality; the checksum also pins determinism across
      // reps (same permutation => same sums)
      val r = operators.CorpusOps.shuffleShards(s, dir)
        .agg(sum(col("pos")).as("pos_sum"), count(lit(1)).as("rows"))
        .collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"q119_shuffle_shards rep$rep: $t%.1f s pos_sum=${r.getLong(0)} rows=${r.getLong(1)}")
      System.gc()
    }
    s.stop()
  }
}
