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
    // the StarRocks/ClickHouse funnel in SQL:
    //   window_funnel(evs, 'step1,step2,...', windowMicros[, dedup])
    // over an array<struct<ts: long µs, et: string>> column (build it
    // with sort_array(collect_list(struct(...)))); steps/window/dedup
    // must be literals — they configure the codegen'd kernel
    e.injectFunction((
      FunctionIdentifier("window_funnel"),
      new ExpressionInfo(classOf[graft.functions.WindowFunnelMax].getName,
        "window_funnel"),
      (children: Seq[Expression]) => {
        if (children.size < 3 || children.size > 4)
          throw new IllegalArgumentException(
            "window_funnel(evs, 'steps,csv', windowMicros[, dedup]) " +
              s"expects 3-4 arguments, got ${children.size}")
        def lit(i: Int, what: String): Any = children(i) match {
          // NULL literal named explicitly — .toString on it below
          // would otherwise surface as a bare NullPointerException
          case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
            throw new IllegalArgumentException(
              s"window_funnel $what must be a non-NULL literal")
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v
          case other => throw new IllegalArgumentException(
            s"window_funnel $what must be a literal, got $other")
        }
        val steps = lit(1, "step list").toString.split(",").map(_.trim).toSeq
        val micros = lit(2, "window").toString.toLong
        val dedup = children.size > 3 && lit(3, "dedup").toString.toBoolean
        graft.functions.WindowFunnelMax(children(0), steps, micros, dedup)
      }))
    // content-defined chunk boundaries in SQL:
    //   cdc_boundaries(text[, k, base, mod])
    // config args must be literals — they parameterize the codegen'd
    // rolling-hash kernel (defaults = the chunk_cdc rule: 8, 31, 61)
    e.injectFunction((
      FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(classOf[graft.functions.CdcBoundaries].getName,
        "cdc_boundaries"),
      (children: Seq[Expression]) => {
        if (children.isEmpty || children.size > 4)
          throw new IllegalArgumentException(
            s"cdc_boundaries(text[, k, base, mod]) expects 1-4 arguments, " +
              s"got ${children.size}")
        def lit(i: Int, what: String, default: Long): Long =
          if (children.size <= i) default
          else children(i) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
              throw new IllegalArgumentException(
                s"cdc_boundaries $what must be a non-NULL literal")
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toLong
            case other => throw new IllegalArgumentException(
              s"cdc_boundaries $what must be a literal, got $other")
          }
        graft.functions.CdcBoundaries(children.head,
          k = lit(1, "window k", 8L).toInt,
          base = lit(2, "base", 31L), mod = lit(3, "mod", 61L))
      }))
    // scalar quantile extraction from a stored Qsk sketch column:
    //   percentile_approx_raw(sk, q)   (q a literal in [0,1])
    e.injectFunction((
      FunctionIdentifier("percentile_approx_raw"),
      new ExpressionInfo(classOf[graft.functions.QskQuantile].getName,
        "percentile_approx_raw"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"percentile_approx_raw(sk, q) expects 2 arguments, got ${children.size}")
        val q = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
            throw new IllegalArgumentException(
              "percentile_approx_raw q must be a non-NULL literal")
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toDouble
          case other => throw new IllegalArgumentException(
            s"percentile_approx_raw q must be a literal, got $other")
        }
        graft.functions.QskQuantile(children.head, q)
      }))
    // the KMV (bottom-k / theta) scalar family — each SQL name is the
    // SAME native-expression composition the typed Column helpers
    // build (GraftSqlBridge wraps the parsed children as Columns and
    // hands the composed tree back): zero UDFs, whole-stage codegen,
    // one definition for both surfaces. k is bound to Kmv.DefaultK,
    // the SQL-registration-binds-one-instance convention (mg_sketch,
    // percentile_union_p50); variable k stays in the typed API.
    locally {
      import org.apache.spark.sql.GraftSqlBridge.{column, expression}
      import graft.functions.Kmv
      def scalar1(name: String, f: org.apache.spark.sql.Column =>
          org.apache.spark.sql.Column): Unit =
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(Kmv.getClass.getName, name),
          (children: Seq[Expression]) => {
            if (children.size != 1) throw new IllegalArgumentException(
              s"$name(x) expects 1 argument, got ${children.size}")
            expression(f(column(children.head)))
          }))
      def scalar2(name: String, f: (org.apache.spark.sql.Column,
          org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit =
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(Kmv.getClass.getName, name),
          (children: Seq[Expression]) => {
            if (children.size != 2) throw new IllegalArgumentException(
              s"$name(a, b) expects 2 arguments, got ${children.size}")
            expression(f(column(children(0)), column(children(1))))
          }))
      scalar1("kmv_hash", Kmv.hash63)
      scalar1("kmv_distinct_est", sk => Kmv.distinctEst(sk))
      scalar2("kmv_intersect_est", (a, b) => Kmv.intersectEst(a, b))
      scalar2("kmv_union_est", (a, b) => Kmv.unionEst(a, b))
      scalar2("kmv_jaccard_est", (a, b) => Kmv.jaccardEst(a, b))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // transparent MV rewrite (no-op while no MV is registered)
    e.injectOptimizerRule(session => new graft.plans.MvRewriteRule(session))
  }
}
