package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe of a string column against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch Spark
  * itself ships for `DataFrameStatFunctions.bloomFilter`). The filter
  * rides along as one reference object into codegen — no UDF
  * serialization per row, no broadcast-variable lookup in the loop.
  *
  * Semantics match the builder: `stat.bloomFilter` on a string column
  * inserts UTF-8 string keys, so the probe uses `mightContainString`.
  * May return true for absent keys (false-positive rate set at build
  * time), never false for present ones.
  */
case class BloomContains(child: Expression,
                         bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
