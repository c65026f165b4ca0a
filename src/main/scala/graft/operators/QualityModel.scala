package graft.operators

import graft.Tables
import graft.Lineage.TruncateOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Trained quality classifier: logistic regression by distributed batch
  * gradient descent over document features, with weak-supervision labels
  * (membership in the curated sources) — the "train a quality filter on
  * a trusted slice, apply it to the crawl" pipeline step.
  *
  * Everything is engine-exact (the q63 k-means discipline applied to
  * GD): features live on integer grids (token count, per-mille average
  * word length, per-mille stopword ratio), weights on a 1e-6 grid, the
  * sigmoid is the HARD sigmoid clamp(z/4 + 1/2, 0, 1) — piecewise-linear,
  * so no transcendental whose last-ulp behavior differs between engines —
  * and every gradient is an exact DECIMAL(38,0) sum of bounded integer
  * products, floor-quantized back to the weight grid. Any engine
  * replaying the same arithmetic reproduces the weights bit-for-bit,
  * which is what lets a recursive-free DuckDB mirror oracle-check three
  * full GD iterations.
  *
  * Scale shape: ONE corpus scan builds the (4 ints + label) feature
  * table (lineage-truncated — it is corpus-rows × 5 longs); each
  * iteration is one map-side-partial aggregate over it (6 sums), and
  * only the 4-weight model crosses the driver per iteration.
  */
object QualityModel {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val CuratedSources = Seq("src0", "src1", "src2", "src3", "src4")

  /** Integer-grid features + weak label, one narrow scan. */
  private def features(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        least(size(col("toks")).cast(LongType), lit(1000L)).as("x1"),
        floor(lit(1000.0) * length(regexp_replace(col("text"), " ", "")) /
          size(col("toks"))).as("x2"),
        floor(lit(1000.0) *
          size(filter(col("toks"), t => t.isInCollection(Stopwords))) /
          size(col("toks"))).as("x3"),
        when(col("source").isInCollection(CuratedSources), 1L).otherwise(0L).as("y"))
  }

  /** `iters` GD iterations; returns one row per iteration:
    * (iter, n, n_correct BEFORE the update, post-update weights in 1e-6
    * grid units). Learning rate 1/16 per averaged sample.
    */
  def train(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val f = features(s, d).truncated
    def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 0))).cast(DoubleType)
    var w = Array(0L, 0L, 0L, 0L) // w1, w2, w3, b — 1e-6 grid
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long, Long, Long)]
    for (it <- 1 to iters) {
      val z = lit(w(0)) * col("x1") + lit(w(1)) * col("x2") +
        lit(w(2)) * col("x3") + lit(w(3))
      val p = least(lit(1000000L),
        greatest(lit(0L), floor(z / lit(4.0)).cast(LongType) + lit(500000L)))
      val err = p - col("y") * lit(1000000L)
      val r = f.agg(
        count(lit(1)).as("n"),
        dsum(err * col("x1")).as("g1"),
        dsum(err * col("x2")).as("g2"),
        dsum(err * col("x3")).as("g3"),
        dsum(err).as("gb"),
        sum(when((p > 500000L) === (col("y") === 1L), 1L).otherwise(0L)).as("ok"))
        .head()
      val n = r.getLong(0)
      val grads = Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val correct = r.getLong(5)
      w = w.zip(grads).map { case (wj, g) =>
        wj - math.floor(g / (n * 16.0)).toLong
      }
      out += ((it, n, correct, w(0), w(1), w(2), w(3)))
    }
    out.toSeq.toDF("iter", "n", "n_correct", "w1", "w2", "w3", "b").orderBy("iter")
  }

  /** Score every document with a trained model (weights from [[train]]'s
    * last iteration): the apply-side of the filter. Pure row-local
    * arithmetic — at 100 TB this is a narrow map inside the scan.
    */
  def score(s: SparkSession, d: String, w: Array[Long]): DataFrame = {
    val f = features(s, d)
    val z = lit(w(0)) * col("x1") + lit(w(1)) * col("x2") +
      lit(w(2)) * col("x3") + lit(w(3))
    f.select(col("doc_id"),
      least(lit(1000000L),
        greatest(lit(0L), floor(z / lit(4.0)).cast(LongType) + lit(500000L)))
        .as("p_micro"))
      .orderBy("doc_id")
  }
}
