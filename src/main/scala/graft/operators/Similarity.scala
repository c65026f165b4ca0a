package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2c).
  *
  * Baseline: brute-force cosine top-k against a broadcast query vector —
  * one narrow scan, TakeOrderedAndProject, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing (IVF-style): rows are
  * pre-bucketed by 8 sign bits, a query scans only its probe buckets
  * (~9/256 of the corpus at 1 probe-bit) instead of everything.
  */
object Similarity {

  /** Brute-force cosine top-k for the query vector `vec_id = queryId`.
    * The single-row query side is broadcast; the corpus never shuffles —
    * Catalyst plans scan → project(cosine) → TakeOrderedAndProject.
    */
  def knnBrute(s: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine(col("embedding"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  private val Hyperplanes = 8
  private val Dim = 64

  /** Deterministic pseudo-random ±1 hyperplanes (fixed seed → the bucket
    * function is stable across runs and executors).
    */
  private[operators] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Hyperplanes, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** LSH bucket id of a vector column: 8 sign bits of hyperplane dots. */
  def lshBucket(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** IVF/LSH-bucketed ANN: compute buckets once, search only the query's
    * bucket plus all 1-bit-flip probe buckets. At 100 TB the bucketed
    * table would be written out partitioned by bucket so a query prunes
    * partitions at the source.
    */
  def knnLsh(s: SparkSession, d: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, d).withColumn("bucket", lshBucket(col("embedding")))
    // one-row lookup of the query vector + its bucket (a query parameter,
    // not a data collect)
    val qRow = e.filter(col("vec_id") === queryId).select("embedding", "bucket").head()
    val qBucket = qRow.getInt(1)
    val probes = qBucket +: (0 until Hyperplanes).map(i => qBucket ^ (1 << i))
    val qv = array(qRow.getSeq[Float](0).map(f => lit(f.toDouble)): _*)
    e.filter(col("bucket").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine(col("embedding"), qv), 4).as("sim"),
        col("bucket"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
