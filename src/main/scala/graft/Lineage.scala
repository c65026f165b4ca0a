package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE operators (PageRank rounds, BPE merge
  * loops, label propagation, Lloyd's k-means): each round must cut the
  * plan DAG or iteration N replans/re-executes all N-1 predecessors.
  *
  * Two modes behind one call:
  *  - default: `localCheckpoint(eager = true)` — executor-resident
  *    blocks, no dfs round-trip. Fast, but on a REAL cluster an executor
  *    loss mid-iteration kills the job (truncated lineage = no recompute
  *    path).
  *  - `spark.graft.checkpointDir=<dir>` (session conf): RELIABLE
  *    `checkpoint(eager = true)` into that directory (HDFS/object store
  *    on a cluster) — iterations survive executor loss at the cost of a
  *    write per round. The production dial for long iterative jobs.
  *
  * Results are identical either way (spec-asserted on pageRank): the
  * mode only changes where the truncated result lives.
  */
object Lineage {

  val ConfKey = "spark.graft.checkpointDir"

  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        // setCheckpointDir creates a fresh subdir under `dir`; only (re)set
        // when unset or pointed somewhere else, so one session reuses one
        // subdir instead of spawning one per truncate call. Compare the
        // current checkpoint dir's PARENT path component-exactly — a raw
        // substring test would false-match /data/ckpt against a current
        // /data/ckpt2/<uuid> and silently keep checkpointing to the old
        // location after the conf is re-pointed.
        val target = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
        val currentParent = sc.getCheckpointDir.flatMap { cd =>
          val p =
            try java.nio.file.Paths.get(java.net.URI.create(cd))
            catch { case _: Exception => java.nio.file.Paths.get(cd) }
          Option(p.getParent).map(_.toString)
        }
        if (!currentParent.contains(target)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
