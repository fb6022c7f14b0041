package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static single-pass 64-bit SimHash kernel shared by interpreted eval
  * and generated code. Semantics match the SQL oracle exactly: per
  * whitespace token, h = first 16 hex chars of md5 as an unsigned
  * 64-bit value; bit j of the result is set iff
  * Σ_tokens (2·bit_j(h) − 1) > 0.
  *
  * 64 bits (vs the 32-bit variant) exist for banding at corpus scale:
  * Hamming-≤3 pair generation partitions the fingerprint into 4 bands
  * of 16 bits, giving 65,536 values per band — the expected band
  * bucket is n/65,536, so the banded self-join stays near-linear where
  * 8-bit bands (256 buckets) degrade to O(n²/256).
  */
object SimHash64Impl {
  def compute(text: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    val s = text.toString
    var start = 0
    while (start <= s.length) {
      val end0 = s.indexOf(' ', start)
      val end = if (end0 < 0) s.length else end0
      // split(" ", -1) semantics: empty tokens count too
      val token = s.substring(start, end)
      val d = md.digest(token.getBytes("UTF-8"))
      // first 8 digest bytes = first 16 hex chars, big-endian
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      if (end0 < 0) start = s.length + 1 else start = end + 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}

/** 64-bit SimHash of a text column in one pass inside whole-stage
  * codegen. Registered as SQL `simhash64` by GraftExtensions.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Impl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
