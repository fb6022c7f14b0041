package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries by KARP-RABIN rolling hash — the
  * codegen kernel behind `chunk_cdc`. For a text of L codepoints it
  * returns every 1-based position `i` in `[k, L]` where the polynomial
  * hash of the trailing k-codepoint window,
  * `H(i) = Σ_{j=0..k-1} cp[i-k+j] · base^(k-1-j)`, satisfies
  * `H(i) % mod == 0`. A text shorter than k has no boundaries.
  *
  * This replaces the md5-per-character-position boundary pass (the r8
  * form's dominant cost: one full digest per position). The rolling
  * recurrence `H_i = H_{i-1}·base + cp_i − cp_{i-k}·base^k` is ~4
  * integer ops per position — the FastCDC/rsync arithmetic — and the
  * whole pass stays inside whole-stage codegen.
  *
  * Exactness contract (what lets DuckDB replay it): NO modular
  * reduction during the roll. With base=31 and k=8 the largest
  * window hash is maxCp · (base^k − 1)/(base − 1) ≈ 3.3·10^16 and the
  * largest rolling intermediate is ≈ 31× that — both well inside
  * Int64, so every H(i) is the exact integer the oracle's 8-term
  * per-position sum computes. Positions are CODEPOINT indices (Spark
  * `length`/`substr` and DuckDB `len`/`substr`/`ord` all count
  * characters, so both engines see identical windows on non-BMP text).
  *
  * `mod` should be coprime to small powers of `base`: 31² ≡ 1
  * (mod 64), so a mod-64 gate would collapse the window to two
  * alternating weight classes; the default callers use the prime 61,
  * which keeps all k positions independently weighted.
  */
object CdcBoundariesImpl {
  def compute(text: UTF8String, k: Int, base: Long, mod: Long): ArrayData = {
    val cp = text.toString.codePoints().toArray
    val L = cp.length
    if (L < k) return ArrayData.toArrayData(Array.emptyIntArray)
    var powK = 1L
    var p = 0
    while (p < k) { powK *= base; p += 1 }
    val out = new java.util.ArrayList[Integer](math.max(4, L / mod.toInt))
    var h = 0L
    var i = 0
    while (i < L) {
      h = h * base + cp(i)
      if (i >= k) h -= cp(i - k) * powK
      if (i >= k - 1 && h % mod == 0L) out.add(i + 1)
      i += 1
    }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }
}

/** `cdc_boundaries(text)` — boundary positions of the rolling-hash
  * content-defined chunking rule, one row-local pass in codegen. */
case class CdcBoundaries(child: Expression, k: Int = 8,
                         base: Long = 31L, mod: Long = 61L)
    extends UnaryExpression {
  require(k > 0 && base > 1 && mod > 1, s"bad chunking config k=$k base=$base mod=$mod")
  // exactness precondition (see object scaladoc): the largest rolling
  // intermediate must fit in Int64 for any codepoint
  require(BigInt(0x10FFFF) * (BigInt(base).pow(k + 1) - 1) / (base - 1)
    <= BigInt(Long.MaxValue), s"base^k overflow risk: k=$k base=$base")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundariesImpl.compute(input.asInstanceOf[UTF8String], k, base, mod)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundariesImpl.compute($c, $k, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
