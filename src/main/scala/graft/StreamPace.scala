package graft

import graft.streaming.StreamOps

/** Measures the streaming trigger-size dial (SCALE.md): the identical
  * event-time windowed count paced through 16→1 micro-batches by varying
  * `maxFilesPerTrigger` over a 16-file staged source. Results are
  * batch-boundary-invariant (q30b's oracle asserts that); this main
  * measures the COST curve — state-store open/commit/snapshot is paid
  * per partition per batch, so many small triggers buy latency with a
  * fixed overhead per batch.
  *
  * Prints one JSON line: {"metric":"stream_trigger_pace",...,
  * "batches":{"16":sec,...,"1":sec}}.
  */
object StreamPace {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus)
    val nFiles = 16
    // warm run: stages the 16-file copy and pays codegen/JIT once
    StreamOps.windowedCountsPaced(spark, sfDir, nFiles, nFiles).count()
    val timed = Seq(16, 8, 4, 2, 1).map { mft =>
      val t0 = System.nanoTime()
      StreamOps.windowedCountsPaced(spark, sfDir, nFiles, mft).count()
      (nFiles / mft, (System.nanoTime() - t0) / 1e9)
    }
    val js = timed.map { case (batches, sec) => s""""$batches":$sec""" }.mkString(",")
    println(s"""{"metric":"stream_trigger_pace","unit":"sec","nFiles":$nFiles,"batches":{$js},"sf":"$sfDir"}""")
    spark.stop()
  }
}
