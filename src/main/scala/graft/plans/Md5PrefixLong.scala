package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's cross-engine hash convention — the value of the first
  * `hexChars` hex characters of `md5(input)` — as ONE native codegen'd
  * expression.
  *
  * The composed form `conv(substring(md5(x), 1, n), 16, 10)` is
  * semantically identical but materializes a 32-char hex UTF8String,
  * slices it, and re-parses the slice per row; on hash-per-occurrence
  * operators (q114's ~30 bigrams/doc, q117/q119's per-doc keys) those
  * allocations ride the hottest loop in the plan. This expression takes
  * the top 4·n bits of the raw digest directly — bit-identical output
  * (spec-asserted against the composed chain), same DuckDB
  * replayability, no intermediate strings.
  *
  * `hexChars` ≤ 15 keeps the value inside a non-negative LONG.
  */
case class Md5PrefixLong(child: Expression, hexChars: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (hexChars < 1 || hexChars > 15)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_prefix expects 1 <= hexChars <= 15, got $hexChars")
    else child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_md5_prefix expects a string|binary input, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[UTF8String].getBytes
      case _          => input.asInstanceOf[Array[Byte]]
    }
    Md5PrefixLong.prefix(bytes, hexChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes =
        if (child.dataType == StringType) s"$in.getBytes()" else in
      s"${ev.value} = graft.plans.Md5PrefixLong.prefix($bytes, $hexChars);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_prefix"
}

object Md5PrefixLong {

  // MessageDigest is stateful — one instance per thread, reset by digest()
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 4·`hexChars` bits of md5(bytes), big-endian — exactly the value
    * of the first `hexChars` characters of the hex rendering. Called from
    * generated code; must stay public.
    */
  def prefix(bytes: Array[Byte], hexChars: Int): Long = {
    val dg = md.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = dg(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
