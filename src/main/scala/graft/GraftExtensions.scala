package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{DoubleDot, Opaque, SimHash32, SimHash64, SimHashGrams}

/** Catalyst extensions for the engine, registered on every
  * [[GraftSession]] (public `withExtensions` API — usable verbatim via
  * `spark.sql.extensions=graft.GraftExtensions` on a real cluster).
  *
  * Currently: `double_dot(a, b)` — the codegen dot-product expression;
  * children are cast to array<double> so float embedding columns feed
  * it directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
      (children: Seq[Expression]) => DoubleDot(
        Cast(children(0), ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children.head)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      FunctionIdentifier("simhash_grams"),
      new ExpressionInfo(classOf[SimHashGrams].getName, "simhash_grams"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new IllegalArgumentException(
          s"simhash_grams(text, gramWidth) expects exactly 2 arguments, " +
            s"got ${children.size}")
        SimHashGrams(children(0),
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"simhash_grams gram width must be a literal, got $other")
        })
      }))
    e.injectFunction((
      FunctionIdentifier("opaque"),
      new ExpressionInfo(classOf[Opaque].getName, "opaque"),
      (children: Seq[Expression]) => Opaque(children.head)))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // transparent MV rewrite (no-op while no MV is registered)
    e.injectOptimizerRule(session => new graft.plans.MvRewriteRule(session))
  }
}
