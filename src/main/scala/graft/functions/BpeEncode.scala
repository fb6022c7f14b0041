package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE merge-application kernel shared by interpreted eval and
  * generated code — the tokenizer APPLY step a training pipeline runs
  * (the pair STATISTIC it trains from is C34,
  * [[graft.ops.TextAnalysis.bpePairCounts]]).
  *
  * Semantics (the standard BPE apply, e.g. Sennrich et al. 2016):
  * repeatedly pick the LOWEST-RANKED merge pair with an occurrence in
  * the unit sequence and replace its occurrences left-to-right,
  * non-overlapping; stop when no table pair occurs. Merged units join
  * with a single space, so for a merge table over base words (no
  * spaces in components) a merge can never create a new occurrence of
  * any table pair — each rank is then processed at most once, which is
  * what lets the DuckDB oracle replay the loop as one CTE round per
  * rank. Hierarchical tables (components that are themselves merged
  * units) fall out of the same loop; BpeSpec pins both against an
  * independent single-merge-at-a-time reference.
  */
object BpeImpl {
  def encode(words: Array[String], left: Array[String], right: Array[String]): Array[String] = {
    var units = words
    var changed = true
    while (changed) {
      changed = false
      // lowest rank with at least one occurrence
      var best = -1
      var r = 0
      while (r < left.length && best < 0) {
        var i = 0
        while (i + 1 < units.length && best < 0) {
          if (units(i) == left(r) && units(i + 1) == right(r)) best = r
          i += 1
        }
        r += 1
      }
      if (best >= 0) {
        changed = true
        val out = new scala.collection.mutable.ArrayBuffer[String](units.length)
        var i = 0
        while (i < units.length) {
          if (i + 1 < units.length && units(i) == left(best) && units(i + 1) == right(best)) {
            out += units(i) + " " + units(i + 1)
            i += 2
          } else {
            out += units(i)
            i += 1
          }
        }
        units = out.toArray
      }
    }
    units
  }
}

/** Apply a fixed BPE merge table to a words array — row-local, inside
  * whole-stage codegen (the merge table rides along as a reference
  * object, broadcast with the task closure; no join, no shuffle).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val leftArr = merges.map(_._1).toArray
  @transient private lazy val rightArr = merges.map(_._2).toArray

  def kernel(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = in.getUTF8String(i).toString; i += 1 }
    val out = BpeImpl.encode(words, leftArr, rightArr)
    new GenericArrayData(out.map(s => UTF8String.fromString(s): Any))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
