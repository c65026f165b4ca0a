package graft.operators

import graft.Tables
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2c).
  *
  * Baseline: brute-force cosine top-k against a broadcast query vector —
  * one narrow scan, one codegen'd dot per row ([[graft.plans.ArrayDotProduct]]),
  * TakeOrderedAndProject; the corpus never shuffles.
  * Scale path: random-hyperplane LSH bucketing (IVF-style): rows are
  * pre-bucketed by 8 sign bits, a query scans only its probe buckets
  * (~9/256 of the corpus at 1 probe-bit) instead of everything.
  */
object Similarity {

  /** Brute-force cosine top-k for the query vector `vec_id = queryId`. */
  def knnBrute(s: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"), GraftFunctions.norm(col("embedding")).as("qn"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(
        GraftFunctions.dot(col("embedding"), col("qv")) /
          (GraftFunctions.norm(col("embedding")) * col("qn")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label centroid vectors via posexplode → (label, dim) hash agg —
    * the codegen'd element-wise mean (no interpreted array lambdas), and
    * the building block of IVF coarse quantization / k-means steps.
    */
  def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "e")))
      .groupBy(col("label"), col("i"))
      .agg(round(avg(col("e")), 4).as("mean_e"))
      .orderBy("label", "i")

  private val Hyperplanes = 8
  private val Dim = 64

  /** Deterministic pseudo-random ±1 hyperplanes (fixed seed → the bucket
    * function is stable across runs and executors).
    */
  private[operators] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Hyperplanes, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** LSH bucket id of a vector column: 8 sign bits of hyperplane dots
    * (one codegen'd dot per plane). Caller must have registered
    * [[GraftFunctions]] on the session.
    */
  def lshBucket(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(GraftFunctions.dot(v, planeLit) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** All bucket ids within hamming distance `r` of `bucket` (multi-probe
    * fan-out: C(8,0)+C(8,1)+… buckets).
    */
  private[graft] def probeSet(bucket: Int, r: Int): Seq[Int] = {
    (0 to r).flatMap { dist =>
      (0 until Hyperplanes).combinations(dist).map(_.foldLeft(bucket)((b, i) => b ^ (1 << i)))
    }.distinct
  }

  /** IVF/LSH-bucketed ANN: compute buckets once, search only the query's
    * bucket plus all probe buckets within `probeRadius` bit flips —
    * the recall/cost dial (radius 1 ≈ 9/256 of the corpus, radius 2 ≈
    * 37/256). At 100 TB the bucketed table would be written out
    * partitioned by bucket so a probe set prunes partitions at the
    * source.
    */
  def knnLsh(s: SparkSession, d: String, queryId: Long = 0L, k: Int = 10,
             probeRadius: Int = 1): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).withColumn("bucket", lshBucket(col("embedding")))
    // one-row lookup of the query vector + its bucket (a query parameter,
    // not a data collect)
    val qRow = e.filter(col("vec_id") === queryId).select("embedding", "bucket").head()
    val qBucket = qRow.getInt(1)
    val probes = probeSet(qBucket, probeRadius)
    val qv = array(qRow.getSeq[Float](0).map(f => lit(f.toDouble)): _*)
    val qn = math.sqrt(qRow.getSeq[Float](0).map(f => f.toDouble * f).sum)
    e.filter(col("bucket").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), round(
        GraftFunctions.dot(col("embedding"), qv) /
          (GraftFunctions.norm(col("embedding")) * lit(qn)), 4).as("sim"),
        col("bucket"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
