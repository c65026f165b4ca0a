package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

/** Registration for Graft's native expressions.
  *
  * Cluster path: `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * Library path: `GraftFunctions.register(spark)` (idempotent) — used by
  * the operators so they work on any session handed to them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
    ext.injectFunction(GraftFunctions.minhashDescriptor)
    ext.injectFunction(GraftFunctions.charMinhashDescriptor)
    ext.injectFunction(GraftFunctions.bloomAggDescriptor)
    ext.injectFunction(GraftFunctions.bloomContainsDescriptor)
    ext.injectFunction(GraftFunctions.md5PrefixDescriptor)
  }
}

object GraftFunctions {

  /** Resolve a function argument that must be a foldable integral constant
    * (e.g. `graft_md5_prefix(c, 15)`'s hex-char count). A BIGINT literal,
    * an int-valued expression tree, or a non-foldable column each get a
    * clean analysis-time error naming the function and argument instead of
    * a ClassCastException from a blind `asInstanceOf[Int]` (ADVICE r5).
    */
  private def foldableInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Int = {
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be a foldable integer constant, got $what: ${e.sql}")
    if (!e.foldable) fail("a non-foldable expression")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case s: java.lang.Short   => s.intValue()
      case b: java.lang.Byte    => b.intValue()
      case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
      case null => fail("NULL")
      case other => fail(s"a ${other.getClass.getSimpleName}")
    }
  }

  private[plans] val dotDescriptor = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      ArrayDotProduct(exprs(0), exprs(1)))

  private[plans] val minhashDescriptor = (
    new FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      MinhashSignature(exprs.head))

  private[plans] val charMinhashDescriptor = (
    new FunctionIdentifier("graft_char_minhash"),
    new ExpressionInfo(classOf[CharGramMinhash].getName, "graft_char_minhash"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      CharGramMinhash(exprs.head,
        foldableInt(exprs(1), "graft_char_minhash", "n"),
        foldableInt(exprs(2), "graft_char_minhash", "stride")))

  /** Spark's own Bloom-filter aggregate (the sketch behind runtime join
    * filters), surfaced as a library function: builds a serialized Bloom
    * filter over xxhash64 values. Only the KB..MB sketch crosses stage
    * boundaries — the 100 TB analog of collecting a semi-join key set.
    */
  private[plans] val bloomAggDescriptor = (
    new FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      // return the raw AggregateFunction — the analyzer wraps it in an
      // AggregateExpression, exactly as for built-in aggregate builders
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)))

  private[plans] val bloomContainsDescriptor = (
    new FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_bloom_contains"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1)))

  private[plans] val md5PrefixDescriptor = (
    new FunctionIdentifier("graft_md5_prefix"),
    new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5_prefix"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      Md5PrefixLong(exprs(0), foldableInt(exprs(1), "graft_md5_prefix", "hexChars")))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    Seq(dotDescriptor, minhashDescriptor, charMinhashDescriptor,
        bloomAggDescriptor, bloomContainsDescriptor, md5PrefixDescriptor).foreach { desc =>
      if (!spark.sessionState.functionRegistry.functionExists(desc._1)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          desc._1.funcName, desc._3, "built-in")
      }
    }
  }

  /** Codegen'd dot product (see [[ArrayDotProduct]]); requires register(). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm via the codegen'd dot. */
  def norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))

  /** Row-local 64-perm minhash signature (see [[MinhashSignature]]). */
  def minhash(text: Column): Column = call_function("graft_minhash", text)

  /** Row-local 64-perm minhash over strided char n-grams
    * (see [[CharGramMinhash]]).
    */
  def charMinhash(text: Column, n: Int, stride: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_char_minhash", text, lit(n), lit(stride))
  }

  /** Bloom-filter aggregate over a LONG column (feed it xxhash64 values);
    * returns the serialized sketch as binary. Requires register().
    */
  def bloomAgg(h: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_bloom_agg", h, lit(expectedItems), lit(numBits))
  }

  /** Probe a serialized Bloom filter (pass the sketch as a binary LITERAL
    * so the predicate is foldable and stays inside codegen). May return
    * false-positive trues; never false-negatives. Requires register().
    */
  def bloomContains(bloom: Column, h: Column): Column =
    call_function("graft_bloom_contains", bloom, h)

  /** First-`hexChars`-hex-chars-of-md5 as a LONG (see [[Md5PrefixLong]]) —
    * the cross-engine hash convention without the hex-string round trip.
    * Requires register().
    */
  def md5Prefix(c: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_md5_prefix", c, lit(hexChars))
  }
}
