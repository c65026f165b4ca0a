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
  }
}

object GraftFunctions {

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
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry.functionExists(dotDescriptor._1)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", dotDescriptor._3, "built-in")
    }
    if (!spark.sessionState.functionRegistry.functionExists(minhashDescriptor._1)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_minhash", minhashDescriptor._3, "built-in")
    }
    if (!spark.sessionState.functionRegistry.functionExists(charMinhashDescriptor._1)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_char_minhash", charMinhashDescriptor._3, "built-in")
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
}
