package graft

import org.apache.spark.sql.functions._

/** The q118 deployment-regime measurement: contamination spans against
  * a BOUNDED benchmark suite whose gram set broadcasts, vs the registry
  * query's corpus-derived src0 slice that grows with the corpus and
  * forces a sort-merge (measured super-linear at 50 M docs — SCALE.md
  * round 7). A real eval suite is MBs of documents no matter how big
  * the training pool gets, so pass A should be a map-side semi-join
  * whose cost tracks the corpus SCAN alone; this main measures exactly
  * that on a generated scale dir.
  *
  * The bounded bench = the replica-0 src0 slice (`doc_id < 10^9` —
  * graft.Scale offsets every replica by 10^9·i), i.e. the ORIGINAL
  * source-SF benchmark held fixed while the pool scales around it.
  * The pool is identical to the registry query's (every non-src0 doc),
  * so the two regimes differ ONLY in the bench side's growth law.
  *
  * Usage: runMain graft.ContaminationScale <sfDir> [reps]
  */
object ContaminationScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("source") === "src0" &&
      col("doc_id") < 1000000000L)
    val pool = docs.filter(col("source") =!= "src0")
    println(s"[contamination-scale] bench docs = ${bench.count()}")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      // the checksum pins the report's CONTENT, not just its shape:
      // gram is a groupBy key, so a bare count() already forces pass
      // B's text recovery — but summing gram lengths + occurrence
      // counts makes the cross-scale bit-identity check explicit and
      // guards future report-shape changes
      val r = operators.CorpusOps
        .contaminationSpansAgainst(s, pool, bench)
        .agg(count(lit(1)).as("rows"),
          coalesce(sum(length(col("gram"))), lit(0L)).as("chk"),
          coalesce(sum(col("n_occ")), lit(0L)).as("occ"))
        .collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[contamination-scale] bounded-bench rep$rep: $t%.1f s " +
        s"rows=${r.getLong(0)} chk=${r.getLong(1)} occ=${r.getLong(2)}")
      System.gc()
    }
    s.stop()
  }
}
