package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole 64-permutation MinHash signature of a document in ONE row-local
  * pass — `array<long>` of the per-permutation minimum over the doc's
  * 3-token shingles.
  *
  * Bit-identical to the shuffle-based pipeline
  * (`explode → window lead shingles → xxhash64(t,t1,t2) → distinct →
  * 64 min-aggs`): the shingle hash replays Spark's `XxHash64` seed
  * chain over the three token strings, the permutation hash replays
  * `xxhash64(lit(i), h)`, and a min is duplicate-insensitive so the
  * batch path's `distinct()` needs no replication. What the expression
  * REMOVES is every exchange in the signature stage — the explode, the
  * per-doc window sort, the distinct, and the 64-agg shuffle — making
  * signatures a stateless projection: the shape a streaming admission
  * path or a 100 TB scan wants.
  *
  * Documents with fewer than 3 tokens have no shingles and yield null
  * (the batch pipeline drops them from the signature table; callers
  * filter nulls).
  *
  * Codegen: the generated code is a single static call into
  * [[MinhashKernel]] — one JVM-JIT'd tight loop, no virtual dispatch,
  * inside the surrounding WholeStageCodegen span (same pattern as
  * Spark's own regexp expressions delegating to commons-lang).
  */
case class MinhashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // < 3 tokens → null even for a non-null input string
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call the STATIC FORWARDER (`graft.plans.MinhashKernel.compute`) the
    // compiler emits on the companion class — not `Foo.MODULE$` (the
    // forwarder class has no MODULE$ field, so Janino rejects the
    // generated class and the stage silently falls back to interpreted
    // execution; a non-Serializable object can't ride the references
    // array either). Pinned by the codegen.fallback=false spec.
    val kernel = MinhashKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $kernel.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** Char-n-gram (stride `stride`) twin of [[MinhashSignature]]: the whole
  * 64-perm signature over a document's strided character n-grams in one
  * row-local pass — bit-identical to exploding
  * `xxhash64(substr(text, i, n))` for i = 1, 1+stride, … and running the
  * 64 min-aggs (the q57 signature stage), with zero exchanges. Both
  * paths slice by CODE POINTS (`UTF8String.substring` ≡ SQL `substr`).
  * Documents shorter than n chars yield null.
  */
case class CharGramMinhash(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_minhash expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.computeCharGrams(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static-forwarder call — see [[MinhashSignature.doGenCode]]
    val kernel = MinhashKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $kernel.computeCharGrams($c, $n, $stride);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramMinhash =
    copy(child = newChild)

  override def prettyName: String = "graft_char_minhash"
}

object MinhashKernel {
  val Perms = 64
  private val SparkHashSeed = 42L

  // xxhash64(lit(i), h) hashes the INT literal i first (seed 42), then
  // h with that result as seed; the per-permutation prefix is constant.
  private val permSeed: Array[Long] =
    Array.tabulate(Perms)(i => XXH64.hashInt(i, SparkHashSeed))

  /** Null when the doc has < 3 tokens (no shingles). */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ")
    // in-place compaction of non-empty tokens (Spark path filters empties)
    var n = 0
    var k = 0
    while (k < toks.length) {
      if (toks(k).nonEmpty) { toks(n) = toks(k); n += 1 }
      k += 1
    }
    if (n < 3) return null
    // per-token hash-chain inputs reused across the 3 shingles a token
    // spans: precompute each token's UTF8 bytes once
    val th = new Array[UTF8String](n)
    var i = 0
    while (i < n) { th(i) = UTF8String.fromString(toks(i)); i += 1 }
    val mins = Array.fill(Perms)(Long.MaxValue)
    var j = 0
    while (j <= n - 3) {
      // replay XxHash64(Seq(t, t1, t2)): fold the seed through the chain
      var h = SparkHashSeed
      h = XXH64.hashUTF8String(th(j), h)
      h = XXH64.hashUTF8String(th(j + 1), h)
      h = XXH64.hashUTF8String(th(j + 2), h)
      var p = 0
      while (p < Perms) {
        val v = XXH64.hashLong(h, permSeed(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Null when the doc has < n chars (no grams). Duplicate grams are
    * harmless for the same reason as [[compute]]: min is
    * duplicate-insensitive, so the batch path's `distinct()` needs no
    * replication here.
    */
  def computeCharGrams(text: UTF8String, n: Int, stride: Int): ArrayData = {
    val len = text.numChars()
    if (len < n) return null
    val mins = Array.fill(Perms)(Long.MaxValue)
    var i = 0
    while (i <= len - n) {
      val h = XXH64.hashUTF8String(text.substring(i, i + n), SparkHashSeed)
      var p = 0
      while (p < Perms) {
        val v = XXH64.hashLong(h, permSeed(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += stride
    }
    new GenericArrayData(mins)
  }
}
