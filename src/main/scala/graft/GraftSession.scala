package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Tuned for local[N] testing but chosen to survive a 1000-executor
  * cluster: AQE owns runtime re-planning (partition coalescing + skew-join
  * splitting), dimension tables broadcast, and shuffle partitioning is
  * explicit rather than the 200 default.
  */
object GraftSession {

  /** Apply Graft defaults to any builder (Verify/Bench/tests share this). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Shuffles START wide (8× the steady-state partition count) and AQE
    // coalesces back by size: at small SFs this converges to the same
    // plan, while at 100×+ a 600 M-row exchange lands in ~2 M-row
    // partitions instead of 19 M-row ones that spill. Sizing the
    // *initial* number high and letting AQE shrink is the scale-safe
    // direction; the reverse (small initial) cannot be fixed at runtime.
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      (shufflePartitions * 8).toString)
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = cores
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
