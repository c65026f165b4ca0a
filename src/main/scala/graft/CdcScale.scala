package graft
import org.apache.spark.sql.SparkSession

/** A/B for the q92 snapshot-bootstrap (round-3 judge ask #2): time the
  * streaming CDC apply COLD (first pass — seeds the state store from the
  * base table) vs WARM (second pass — re-opens the checkpointed store;
  * `initialState` is skipped by Spark's first-start-only contract and
  * the pass does delta-sized work). Run against a generated scale dir:
  *
  *   runMain graft.CdcScale /root/repo/target/sf10   # the 100× point
  *
  * Prints one JSON line; numbers recorded in SCALE.md.
  */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cold = time(graft.streaming.StreamOps.streamMergeApply(spark, d).count())
    val warm = time(graft.streaming.StreamOps.streamMergeApply(spark, d).count())
    println(s"""{"metric":"cdc_bootstrap_ab","dir":"$d","cold_sec":$cold,"warm_sec":$warm}""")
    spark.stop()
  }
}
