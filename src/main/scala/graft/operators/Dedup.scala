package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY.md §2c): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale invariant: NO O(n²) pairwise pass. Every near-dup operator
  * generates candidates through a bucketing key (shared shingle, LSH band
  * bucket, simhash chunk, label block) and only compares within buckets.
  * Hot buckets are the skew risk → AQE skew-join stays on; band width /
  * chunk count bound bucket fan-out.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on md5(text); keeps the minimum doc_id as
    * the canonical representative. One shuffle on the 32-char hash.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("h")

  /** Distinct 3-token shingles per doc, with set size. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .withColumn("sz", size(col("sh")))

  /** Exact n-gram Jaccard pairs ≥ τ. Candidates come from a self-join on
    * exploded shingles (only docs sharing ≥1 shingle are ever paired) —
    * the shingle is the shuffle key, so cost is Σ_shingle df² not n².
    */
  def ngramJaccard(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val sh = docShingles(s, d)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s0"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s0") === col("b.s0") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.select(col("doc_id"), col("sz"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  private val MinhashPerms = 64
  private val Bands = 16 // 16 bands × 4 rows

  /** MinHash signature: for permutation i, min over shingles of
    * xxhash64(i, shingle). All 64 mins in one codegen'd projection.
    */
  private def minhashSig = {
    val shCol = col("sh")
    transform(sequence(lit(0), lit(MinhashPerms - 1)),
      i => array_min(transform(shCol, sh0 => xxhash64(i, sh0))))
  }

  /** MinHash + LSH near-dup detection: signature → 16 band keys → bucket
    * self-join → candidates → verified exact Jaccard ≥ τ. The band bucket
    * is the only shuffle key; verified Jaccard removes LSH false
    * positives, so output = true near-dup pairs at LSH recall
    * (~1.0 at j≈0.98 with 16×4 banding).
    */
  def minhashLsh(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val sh = docShingles(s, d).filter(col("sz") > 0)
    val sig = sh.withColumn("mh", minhashSig)
    val rowsPerBand = MinhashPerms / Bands
    val bandKeys = (0 until Bands).map(j =>
      xxhash64(lit(j), array_join(
        transform(slice(col("mh"), j * rowsPerBand + 1, rowsPerBand),
          e => e.cast("string")), ",")))
    val bands = sig.select(
      col("doc_id"), col("sh"), col("sz"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .dropDuplicates("a", "b")
    cand
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= tau)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  private val SimhashBits = 64
  private val SimhashChunks = 8 // 8-bit chunks: pigeonhole guarantees recall for hamming ≤ 7

  /** 64-bit SimHash per document: per-bit ±1 majority over token hashes,
    * built as 64 conditional aggregates in one groupBy pass.
    */
  def simhashSignatures(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until SimhashBits).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until SimhashBits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, candidate
    * generation by 8-bit chunk equality (pigeonhole-complete for ≤ 7).
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    val sig = simhashSignatures(s, d)
    val chunkKeys = (0 until SimhashChunks).map(j =>
      shiftrightunsigned(col("simhash"), j * (SimhashBits / SimhashChunks))
        .bitwiseAND(lit(0xFFL)))
    val chunks = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** Embedding near-dup: cosine ≥ τ within a blocking key (label). The
    * block is the shuffle key; at scale the block would be an LSH bucket
    * (see Similarity.lshBuckets) instead of a metadata label.
    */
  def embeddingCosine(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")), 4))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }
}
