package graft.operators

import graft.Tables
import graft.Lineage.TruncateOps
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

  /** Dimension of the perceptual feature vector produced by the stub
    * decoder — matches the embeddings table's Dim so the ANN/similarity
    * machinery (hyperplane LSH, cell assignment) applies verbatim.
    */
  val PerceptualDim = 64

  /** PERCEPTUAL feature extraction through the batched decode path: one
    * decoder instance per partition (the codec-handle analog), payload
    * bytes → 64-bin term histogram. The histogram is the deterministic
    * stand-in for codec+CNN features — integer counts, so every
    * downstream float op is exact and the whole perceptual chain is
    * oracle-checkable cross-engine; a real deployment swaps ONLY this
    * function's body (decode + embed), keeping schema and plan shape.
    */
  def perceptualFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      // decoder state initialized once per partition, reused row-to-row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val f = new Array[Float](PerceptualDim)
        var start = 0
        var i = 0
        def emit(from: Int, until: Int): Unit = if (until > from) {
          md.reset()
          md.update(payload, from, until - from)
          f((md.digest()(0) & 0xFF) % PerceptualDim) += 1f
        }
        while (i < payload.length) {
          if (payload(i) == 0x20) { emit(start, i); start = i + 1 }
          i += 1
        }
        emit(start, payload.length)
        Row(r.getLong(0), f.toSeq)
      }
    }(enc)
  }

  /** PERCEPTUAL near-dup over multimodal assets — the pipeline the
    * checksum pass (q98) cannot cover: batched per-partition decode →
    * deterministic feature vector → the q55 route verbatim
    * (random-hyperplane LSH bucket blocking + within-bucket cosine with
    * per-vector norms and the codegen'd dot). Candidate cost is
    * Σ_bucket n_b² with `bits` as the scale dial, exactly like
    * [[graft.operators.Similarity.lshBucket]]. Because the stub features
    * are integer-valued, the cosine arithmetic is exact in both engines
    * and the WHOLE chain — decode, histogram, bucket signs, cosine — is
    * hash-checked by a DuckDB mirror ([[perceptualOracleSql]]).
    *
    * τ = 0.96 sits in the measured gap between the shared-vocabulary
    * noise band (cos ≤ 0.94 at both test SFs — those pairs are Ω(n²/2^bits)
    * and must NOT be emitted) and the true near-dup cluster (cos ≥ 0.96),
    * so output size tracks actual duplication, not corpus size.
    */
  def perceptualNearDup(s: SparkSession, d: String, tau: Double = 0.96,
                        bits: Int = 8): DataFrame =
    perceptualPairsFrom(s, assets(s, d), tau, bits)

  /** The decode→feature→LSH→cosine chain over an arbitrary asset frame
    * (asset_id, payload) — split out so specs can feed constructed
    * corpora with known duplicate structure.
    */
  private[graft] def perceptualPairsFrom(s: SparkSession, assetFrame: DataFrame,
                                         tau: Double, bits: Int): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    import graft.plans.GraftFunctions.{dot, norm}
    val v = perceptualFeatures(assetFrame).select(
      col("asset_id"), col("features"),
      Similarity.lshBucket(col("features"), bits).as("bucket"),
      norm(col("features")).as("nrm"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.asset_id") < col("b.asset_id"))
      .withColumn("cos", round(
        dot(col("a.features"), col("b.features")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= tau)
      .select(col("a.asset_id").as("a"), col("b.asset_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }

  /** DuckDB mirror of [[perceptualNearDup]]: recomputes the stub
    * features in SQL (same md5-byte binning), the hyperplane bucket
    * from the SAME ±1 plane literals the Spark expression uses, and the
    * within-bucket cosine. All sums are over exact small integers, so
    * both engines agree bit-for-bit before the 4dp round.
    */
  def perceptualOracleSql(tau: Double = 0.96, bits: Int = 8): String = {
    val bucketExpr = Similarity.planesFor(bits).zipWithIndex.map { case (p, i) =>
      val w = p.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(v, $w) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |tokb AS (
       |  SELECT doc_id,
       |    ((strpos('0123456789abcdef', substring(md5(t),1,1))-1)*16
       |     + (strpos('0123456789abcdef', substring(md5(t),2,1))-1)) % $PerceptualDim AS bin
       |  FROM tok WHERE length(t) > 0),
       |cnts AS (SELECT doc_id, bin, count(*) AS c FROM tokb GROUP BY 1, 2),
       |grid AS (SELECT d.doc_id, g.bin
       |         FROM (SELECT DISTINCT doc_id FROM documents) d
       |         CROSS JOIN (SELECT unnest(range($PerceptualDim)) AS bin) g),
       |feat AS (SELECT g.doc_id,
       |           list(CAST(coalesce(c.c, 0) AS DOUBLE) ORDER BY g.bin) AS v
       |         FROM grid g LEFT JOIN cnts c
       |           ON c.doc_id = g.doc_id AND c.bin = g.bin
       |         GROUP BY g.doc_id),
       |buck AS (SELECT doc_id, v,
       |    $bucketExpr AS bucket
       |  FROM feat)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |       round(list_cosine_similarity(a.v, b.v), 4) AS cos
       |FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $tau
       |ORDER BY a, b""".stripMargin
  }

  // ------------------------------------------------------------------
  // Audio-shaped path: temporal FRAME ENERGIES + delta-sign fingerprint.
  // The decode stub stands in for PCM decode + windowed RMS; everything
  // downstream (fingerprint, landmark blocking, exact verification) is
  // the production shape of audio-dedup at scale.
  // ------------------------------------------------------------------

  val FrameBytes = 16
  val MaxFrames = 8

  /** Per-asset frame-energy profile through the batched per-partition
    * decode path (the audio sibling of [[perceptualFeatures]]): payload
    * bytes → up to [[MaxFrames]] non-overlapping [[FrameBytes]]-byte
    * windows, energy = unsigned byte sum per window. Integer-exact, so
    * the whole downstream chain is oracle-checkable cross-engine; a real
    * deployment swaps the window sum for codec frames + RMS, keeping
    * schema and plan shape.
    */
  def frameEnergies(assetFrame: DataFrame, frameBytes: Int = FrameBytes,
                    maxFrames: Int = MaxFrames): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("energies", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assetFrame.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](1)
        val n = math.min(p.length, frameBytes * maxFrames)
        val e = new Array[Long](math.max(1, (n + frameBytes - 1) / frameBytes))
        var i = 0
        while (i < n) { e(i / frameBytes) += (p(i) & 0xFF).toLong; i += 1 }
        Row(r.getLong(0), e.toSeq)
      }
    }(enc)
  }

  /** Delta-sign fingerprint per asset: bit i ⇔ energy rose from frame i
    * to i+1 — the classic audio-fingerprint bit pattern, row-local over
    * the energy array (no shuffle).
    */
  private def deltaSignFp(energies: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rises = zip_with(
      slice(energies, 2, MaxFrames), slice(energies, 1, MaxFrames),
      (nx, pv) => when(nx > pv, 1L).otherwise(0L))
    // little-endian bit pack via a big-endian fold over the reversed
    // rise array: acc·2 + bit — integer-exact, no per-index shift
    aggregate(reverse(rises), lit(0L), (acc, b) => acc * 2L + b)
  }

  /** Audio-style near-dup over the frame-energy profiles (q108): assets
    * whose decoded frame sequences carry IDENTICAL energy profiles (at
    * `maxL1 = 0`, the exhaustive-oracle default) or nearly so (the
    * tolerant dial). The dial's recall GUARANTEE (spec-pinned in
    * StreamAndMultimodalSpec): total for pairs diverging in AT MOST ONE
    * frame within L1 `maxL1`; a pair diverging in 2+ frames shares no
    * leave-one-out band even when its total L1 fits the dial — every
    * mask leaves a divergent frame exposed. Multi-frame drift would need
    * multi-mask (leave-two-out) banding, squaring the band count.
    * Candidates come from LEAVE-ONE-OUT banding — band j hashes the
    * whole profile with frame j masked, so profile-identical pairs share
    * EVERY band (recall 1 at maxL1 = 0) and pairs differing in exactly
    * one frame share the band masking it. Band keys carry full-profile
    * entropy, so df per band ≈ true cluster size and cost stays linear —
    * the first cut used adjacent-frame-PAIR landmarks, whose low entropy
    * (frame sums concentrate around the mean) made Σ df² detonate at the
    * 10000× point (OOM-killed at 50 M docs). Verification is the exact
    * integer L1 distance; the delta-sign fingerprint rides along as the
    * display/index column.
    */
  def audioNearDup(s: SparkSession, d: String, maxL1: Long = 0): DataFrame =
    audioPairsFrom(assets(s, d), maxL1)

  /** The frame-energy → band → verify chain over an arbitrary asset
    * frame (asset_id, payload) — split out so specs can feed constructed
    * corpora with known duplicate/truncation structure.
    */
  private[graft] def audioPairsFrom(assetFrame: DataFrame, maxL1: Long): DataFrame = {
    // empty payloads carry no signal and the oracle's per-byte unnest
    // naturally excludes them — drop them here too, or every empty asset
    // would pair with every other at l1 = 0 under the manufactured
    // single-frame [0] profile
    val en = frameEnergies(assetFrame.filter(length(col("payload")) > 0))
      .withColumn("fp", deltaSignFp(col("energies")))
      .truncated // feeds both band sides + verification
    val e = col("energies")
    val lm = en.select(col("asset_id"), col("energies"),
      posexplode(transform(sequence(lit(0), size(e) - 1),
        j => xxhash64(lit("band"), j, size(e),
          concat(slice(e, lit(1), j), slice(e, j + 2, size(e))))))
        .as(Seq("i", "lm")))
    val cand = lm.as("a").join(lm.as("b"),
        col("a.lm") === col("b.lm") && col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("a"), col("b.asset_id").as("b"))
      .dropDuplicates("a", "b")
    cand
      .join(en.select(col("asset_id").as("a"), col("energies").as("ea")), "a")
      .join(en.select(col("asset_id").as("b"), col("energies").as("eb")), "b")
      .filter(size(col("ea")) === size(col("eb")))
      .withColumn("l1", aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => abs(x - y)),
        lit(0L), (acc, x) => acc + x))
      .filter(col("l1") <= maxL1)
      .select(col("a"), col("b"), col("l1"))
      .orderBy("a", "b")
  }

  /** DuckDB mirror of [[audioNearDup]] at `maxL1 = 0`: identical energy
    * profiles ⇔ identical energy LISTS, so the oracle is an exhaustive
    * group-by-profile pair join — every landmark/verification step on
    * the Spark side must collapse to exactly these pairs. Energies are
    * recomputed from the text stand-in (payload = utf-8 bytes; the
    * corpus is ASCII, so `ascii(char) = byte`).
    */
  def audioOracleSql(frameBytes: Int = FrameBytes, maxFrames: Int = MaxFrames): String =
    s"""WITH by AS (
       |  SELECT doc_id, (j-1)//$frameBytes AS frame, ascii(substring(text, CAST(j AS INT), 1)) AS v
       |  FROM documents,
       |       unnest(range(1, least(length(text), ${frameBytes * maxFrames}) + 1)) AS u(j)),
       |en AS (SELECT doc_id, frame, sum(v) AS e FROM by GROUP BY 1, 2),
       |prof AS (SELECT doc_id, list(e ORDER BY frame) AS ev FROM en GROUP BY doc_id)
       |SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS BIGINT) AS l1
       |FROM prof a JOIN prof b ON a.ev = b.ev AND a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin

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
