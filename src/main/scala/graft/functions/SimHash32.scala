package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static single-pass SimHash kernel shared by interpreted eval and
  * generated code. Semantics are EXACTLY the exploded formulation
  * (and the SQL oracle): per whitespace token, h = first 8 hex chars
  * of md5 as an unsigned 32-bit int; bit j of the result is set iff
  * Σ_tokens (2·bit_j(h) − 1) > 0.
  */
object SimHash32Impl {
  def compute(text: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](32)
    val s = text.toString
    var start = 0
    while (start <= s.length) {
      val end0 = s.indexOf(' ', start)
      val end = if (end0 < 0) s.length else end0
      // split(" ", -1) semantics: empty tokens count too
      val token = s.substring(start, end)
      val d = md.digest(token.getBytes("UTF-8"))
      // first 4 digest bytes = first 8 hex chars, as unsigned 32-bit
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      if (end0 < 0) start = s.length + 1 else start = end + 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}

/** 32-bit SimHash of a text column in one pass — no token explode, no
  * 32-column aggregation; runs inside whole-stage codegen via a static
  * kernel call. Registered as SQL `simhash32` by GraftExtensions.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32Impl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
