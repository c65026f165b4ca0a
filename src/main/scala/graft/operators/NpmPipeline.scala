package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity pipeline: npm dependency counting (SURVEY.md §1).
  *
  * Reference dataflow (Main.scala): gz lines → throttle → HTTP fetch →
  * explode versions → dual-branch runtime/dev counts (Broadcast+Zip,
  * Balance+Merge) → fold into pkg→version→(deps, devDeps) → print.
  *
  * Spark-first dataflow: names → enrichment (broadcast snapshot join or
  * per-partition client) → `explode(versions)` → ONE projection computing
  * both counts (`map_size` of each dependency map — Catalyst evaluates
  * both in the same codegen'd stage, which strictly dominates the
  * reference's duplicated branches) → grouped accumulation as a real
  * nested map. Parallelism (the reference's Balance across 2 lanes) is
  * partitioning, not topology.
  */
object NpmPipeline {

  /** Per-(package, version) dependency counts from parsed metadata
    * (Registry.parseMetadata output with a `meta` column).
    * Matches DependencyCount(packageName, version, dependencies,
    * devDependencies) — reference DependencyCount.scala.
    */
  def dependencyCounts(parsed: DataFrame): DataFrame =
    parsed
      // malformed / unparseable registry bodies are skipped, matching the
      // reference's catch-and-continue (NpmPackage.scala:17-19)
      .filter(col("meta").isNotNull && col("meta.name").isNotNull &&
        col("meta.versions").isNotNull)
      .select(col("meta.name").as("package"), explode(col("meta.versions")).as(Seq("version", "v")))
      .select(
        col("package"),
        col("version"),
        coalesce(size(col("v.dependencies")), lit(0)).as("dependencies"),
        coalesce(size(col("v.devDependencies")), lit(0)).as("devDependencies"))

  /** Reverse-dependency analytics — the inverse of the reference's
    * per-version counts: for every dependency, how many distinct packages
    * depend on it (in any version). The classic "most-depended-upon"
    * registry query; scales as explode → distinct → count.
    */
  def reverseDependencyCounts(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("meta").isNotNull && col("meta.name").isNotNull &&
        col("meta.versions").isNotNull)
      .select(col("meta.name").as("package"), explode(col("meta.versions")).as(Seq("version", "v")))
      .filter(col("v.dependencies").isNotNull)
      .select(col("package"), explode(map_keys(col("v.dependencies"))).as("dep"))
      .distinct()
      .groupBy(col("dep"))
      .agg(count(lit(1)).as("n_dependents"))
      .orderBy(col("n_dependents").desc, col("dep"))

  /** Global accumulation: package → sorted map(version → (deps, devDeps))
    * — the reference's AccumulatedDependencyCount as one grouped
    * aggregation instead of a single-threaded fold.
    */
  def accumulate(counts: DataFrame): DataFrame =
    counts
      .groupBy(col("package"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("version"), struct(col("dependencies"), col("devDependencies"))))))
        .as("versions"))

  /** The reference's sink format (Main.scala:88-95) as data: one line per
    * package header + one per version.
    */
  def prettyLines(accumulated: DataFrame): DataFrame = {
    val spark = accumulated.sparkSession
    import spark.implicits._
    accumulated
      .select(col("package"), explode(col("versions")).as(Seq("version", "c")))
      .select(col("package"), col("version"),
        col("c.dependencies").as("deps"), col("c.devDependencies").as("devs"))
      .orderBy("package", "version")
      .select(concat(
        lit("version: "), col("version"),
        lit(", Dependencies: "), col("deps"),
        lit(", DevDependencies: "), col("devs")).as("line"),
        col("package"))
  }
}
