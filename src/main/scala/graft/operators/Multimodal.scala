package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2c row 34).
  *
  * Media are opaque `binary` payloads plus a typed metadata struct. The
  * Spark-side machinery — schema, batched per-partition processing,
  * partition sizing — is real and tested; the actual media decode is a
  * clearly marked deterministic STUB because no image/audio libraries
  * ship in this container. Swapping `StubDecoder` for a real codec is the
  * only change needed on a cluster.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Manufacture a multimodal asset table from `documents` (payload =
    * utf-8 bytes of the text — a stand-in for image/audio bytes with the
    * exact schema a real ingest would produce).
    */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(0).as("width"),
        lit(0).as("height"),
        length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Payload metadata extraction — fully declarative, no decode needed:
    * size + content hash. This is the oracle-checked part.
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    assets(s, d).select(
      col("asset_id"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("payload"), 256).as("sha"))
      .orderBy("asset_id")

  /** Content-addressed BINARY dedup (the checksum pass every multimodal
    * corpus runs before any perceptual matching — LAION-style): assets
    * grouped by payload digest, keeper = min asset id per cluster. ONE
    * shuffle keyed by the 256-bit digest (payloads themselves never
    * shuffle — the digest is computed in the scan); the window over the
    * digest partition is bounded by duplicate-cluster size.
    */
  def binaryDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h"))
    assets(s, d)
      .select(col("asset_id"), sha2(col("payload"), 256).as("h"))
      .select(col("asset_id"),
        min(col("asset_id")).over(w).as("keeper"),
        count(lit(1)).over(w).as("copies"))
      .orderBy("asset_id")
  }

  // ------------------------------------------------------------------
  // STUB decode path. A real deployment replaces StubDecoder.decode with
  // an image/audio codec; everything around it (batching, schema,
  // partition shape) is production Spark.
  // ------------------------------------------------------------------

  /** Fixed-length fake feature vector derived deterministically from the
    * payload bytes. STUB standing in for e.g. a JPEG decode + CNN
    * featurizer.
    */
  object StubDecoder extends Serializable {
    val FeatureDim = 8
    def decode(payload: Array[Byte]): Array[Double] = {
      val f = new Array[Double](FeatureDim)
      var i = 0
      while (i < payload.length) { f(i % FeatureDim) += (payload(i) & 0xFF) / 255.0; i += 1 }
      f
    }
  }

  /** Batched per-partition feature extraction: the Scala analog of
    * `mapInPandas` — one decoder instance per partition, rows streamed
    * through it (never materialized whole).
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      // decoder state initialized once per partition (codec handle analog)
      val dec = StubDecoder
      rows.map { r =>
        Row(r.getLong(0), dec.decode(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
  }

  /** Deterministic frame sampling: every stride-th byte window — the
    * plumbing shape of video frame extraction (payload → many rows).
    */
  def frameSample(assets: DataFrame, frameBytes: Int = 16, maxFrames: Int = 4): DataFrame =
    assets.select(
      col("asset_id"),
      posexplode(transform(
        slice(sequence(lit(0), lit(maxFrames - 1)), 1, maxFrames),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_no", "frame")))
      .filter(length(col("frame")) > 0)
}
