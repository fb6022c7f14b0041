package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Multi-anchor window-funnel kernel shared by interpreted eval and
  * generated code. Semantics are EXACTLY `ops.Funnel.depthMax`'s
  * value-based rules (and therefore its DuckDB oracle's): every
  * step-0 event anchors a trial; step i is the MINIMUM step-i
  * timestamp strictly after step i−1 and ≤ anchor + window; dedup
  * breaks a trial when an already-matched step type repeats strictly
  * between step i−1 and the candidate (ties kill); the best trial's
  * depth wins, 0 with no anchor.
  *
  * Why native: the declarative formulation evaluates nested
  * higher-order lambdas per anchor — O(anchors × events × steps)
  * interpreted. This kernel gathers each step's timestamps once,
  * sorts them, and binary-searches per chain step:
  * O(E log E + anchors × steps² × log E) in primitive long arrays.
  * An event whose type appears at several step positions (repeated
  * step names) enters every matching step's array, preserving the
  * declarative semantics.
  */
object WindowFunnelImpl {

  def maxDepth(arr: ArrayData, stepNames: Array[String],
               windowMicros: Long, dedup: Boolean): Long =
    depth(arr, stepNames, windowMicros, dedup, firstAnchorOnly = false)

  def depth(arr: ArrayData, stepNames: Array[String],
            windowMicros: Long, dedup: Boolean,
            firstAnchorOnly: Boolean): Long = {
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val ets = new Array[String](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        ts(m) = row.getLong(0)
        ets(m) = row.getUTF8String(1).toString
        m += 1
      }
      i += 1
    }
    depthArrays(ts, ets, m, stepNames, windowMicros, dedup, firstAnchorOnly)
  }

  /** Pure-JVM entry over parallel (ts, type) arrays — shared by the
    * codegen expression above and the streaming state machine
    * ([[graft.streaming.EventStream.funnelDepthStream]]). Only the
    * first `m` slots of each array are read. */
  def depthArrays(ts: Array[Long], ets: Array[String], m: Int,
                  stepNames: Array[String], windowMicros: Long,
                  dedup: Boolean, firstAnchorOnly: Boolean): Long = {
    val k = stepNames.length
    val counts = new Array[Int](k)
    var i = 0
    while (i < m) {
      val et = ets(i)
      var s = 0
      while (s < k) { if (stepNames(s) == et) counts(s) += 1; s += 1 }
      i += 1
    }
    val steps = Array.tabulate(k)(s => new Array[Long](counts(s)))
    val fill = new Array[Int](k)
    i = 0
    while (i < m) {
      val et = ets(i)
      var s = 0
      while (s < k) {
        if (stepNames(s) == et) { steps(s)(fill(s)) = ts(i); fill(s) += 1 }
        s += 1
      }
      i += 1
    }
    var s = 0
    while (s < k) { java.util.Arrays.sort(steps(s)); s += 1 }

    // first element strictly greater than prev (Long.MaxValue if none)
    def firstAbove(a: Array[Long], prev: Long): Long = {
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (a(mid) <= prev) lo = mid + 1 else hi = mid
      }
      if (lo < a.length) a(lo) else Long.MaxValue
    }

    // first-anchor mode (ops.Funnel.depth semantics): only the
    // earliest step-0 event — steps(0)(0) after the sort — runs a trial
    val anchors = steps(0)
    val anchorLimit = if (firstAnchorOnly) math.min(1, anchors.length)
                      else anchors.length
    var best = 0L
    var ai = 0
    while (ai < anchorLimit && best < k) {
      val a = anchors(ai)
      val horizon = a + windowMicros
      var prev = a
      var depth = 1L
      var ki = 1
      var broken = false
      while (ki < k && !broken) {
        val cand = firstAbove(steps(ki), prev)
        if (cand == Long.MaxValue || cand > horizon) broken = true
        else if (dedup) {
          var rep = Long.MaxValue
          var j = 0
          while (j < ki) {
            val r = firstAbove(steps(j), prev)
            if (r < rep) rep = r
            j += 1
          }
          if (rep <= horizon && cand >= rep) broken = true
          else { depth += 1; prev = cand }
        } else { depth += 1; prev = cand }
        ki += 1
      }
      if (depth > best) best = depth
      ai += 1
    }
    best
  }
}

/** Max funnel depth over an `array<struct<ts: long (µs), et: string>>`
  * column — the StarRocks/ClickHouse `window_funnel()` hot loop as a
  * single native expression inside whole-stage codegen.
  */
case class WindowFunnelMax(child: Expression, stepNames: Seq[String],
                           windowMicros: Long, dedup: Boolean,
                           firstAnchorOnly: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "window_funnel_max"

  @transient private lazy val stepArr = stepNames.toArray

  override def nullSafeEval(input: Any): Any =
    WindowFunnelImpl.depth(input.asInstanceOf[ArrayData], stepArr,
      windowMicros, dedup, firstAnchorOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: the className must be JAVA SOURCE syntax — classOf[Array[_]]
    // .getName renders the JVM-internal "[Ljava.lang.String;" form,
    // which Janino cannot parse; the cast then fails to compile and
    // every caller silently falls back to interpreted eval
    val stepsRef = ctx.addReferenceObj("funnelSteps", stepArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowFunnelImpl.depth($c, $stepsRef, ${windowMicros}L, $dedup, $firstAnchorOnly)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
