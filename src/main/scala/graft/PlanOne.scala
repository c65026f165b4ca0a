package graft

import org.apache.spark.sql.SparkSession

/** Print one query's optimized + physical plan for a dir (planning only,
  * nothing executes): runMain graft.PlanOne <query> [sfDir]
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    println("=== optimized ===")
    println(qe.optimizedPlan.toString)
    println("=== physical ===")
    println(qe.executedPlan.toString)
    spark.stop()
  }
}
