package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared kernel: all hyperplane dot products + band packing in one
  * pass. Bit j of band b is set iff dot(v, planes[b·pb + j]) > 0,
  * with the dot the same sequential left-to-right double sum as
  * [[DoubleDotImpl]] — so results are bit-identical to the unrolled
  * `double_dot(...) > 0` column formulation and to the SQL oracle's
  * `list_dot_product` terms.
  */
object HyperplaneBandsImpl {
  def compute(v: ArrayData, planes: Array[Array[Double]], planeBits: Int): ArrayData = {
    val out = new Array[Long](planes.length / planeBits)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s > 0) out(p / planeBits) |= 1L << (p % planeBits)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** All LSH band values of an embedding in ONE codegen'd pass.
  *
  * The unrolled alternative — `nPlanes` separate `double_dot` columns
  * summed into per-band values — is semantically identical but costs
  * the PLANNER a wide expression tree per query (64 plane literals ×
  * 64 doubles each through analysis/optimization), which dominated
  * the dedup_embedding_lsh wall time. Here the plane matrix rides
  * along as one reference object and the whole signature is a tight
  * primitive loop.
  *
  * `child` must be `array<double>`; returns `array<long>` of length
  * `planes.length / planeBits` (band b in slot b).
  */
case class HyperplaneBands(child: Expression, planes: Array[Array[Double]],
                           planeBits: Int) extends UnaryExpression {
  require(planeBits > 0 && planeBits <= 64 && planes.length % planeBits == 0,
    s"planes (${planes.length}) must split into whole $planeBits-bit bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBandsImpl.compute(input.asInstanceOf[ArrayData], planes, planeBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBandsImpl.compute($c, $ref, $planeBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
