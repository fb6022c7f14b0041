package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MERGEABLE quantile sketch — the StarRocks `PERCENTILE` column
  * type's workflow (`percentile_union` over stored sketches →
  * `percentile_approx_raw`), completing the mergeable-sketch-column
  * trio beside the HLL rollup (B57) and the exact bitmap rollup
  * (B58): daily per-group sketches are the stored pre-aggregate,
  * coarser-grain percentiles come from MERGING sketches, never from
  * re-scanning raw rows.
  *
  * Construction: the classic multi-level compactor family
  * (Manku–Rajagopalan–Lindsay '98 / the KLL shape). Values live in
  * per-level buffers; an item at level `l` carries weight `2^l`. A
  * full level sorts and keeps every other element (alternating
  * offset), pushing the survivors one level up at doubled weight —
  * so the sketch holds ≤ `k` values per level, ~`k·log(n/k)` values
  * total, and the buffer the shuffle carries is ∝ that bound, never
  * ∝ rows. Compaction only ever folds an EVEN count and leaves the
  * remainder in place, so total weight is conserved exactly:
  * Σ values·2^level ≡ count at all times (spec-pinned).
  *
  * Error: each level-`l` compaction moves any rank by ≤ 2^(l-1);
  * with ~n/(k·2^l) compactions at level `l` the worst-case rank drift
  * is ≤ levels·n/(2k) — ~0.8 % of n at the k=512 default / n=10⁵,
  * shrinking as k grows (the gate queries' 5 % flags carry ~6×
  * headroom over it). The alternating-offset choice makes the sketch
  * DETERMINISTIC GIVEN AN INPUT ORDER but (like any partial
  * aggregation) dependent on Spark's partition merge order — so
  * sketch VALUES are engine-internal, and gate-facing queries emit
  * exact values + error-bound flags (the B22/B42/B57 construction)
  * while QskSpec pins the rank bound under multiple partitionings.
  *
  * Exposed aggregators (the Rbm pattern — `udaf` over typed
  * Aggregators, no UDF in the row path):
  *  - [[qskOf]]           rows → sketch (the stored pre-aggregate)
  *  - [[qskMerge]]        sketches → sketch (percentile_union)
  *  - [[qskMergeQuantile]] sketches → quantile estimate (union +
  *    percentile_approx_raw collapsed into one aggregate)
  */
object Qsk {

  /** Internal aggregation state: per-level value buffers (level →
    * values, each with an arr(0)=n header like Rbm's buffer
    * containers so appends are O(1) amortized) plus the exact row
    * count and a compaction counter driving the alternating offset. */
  final case class State(k: Int, count: Long, flips: Long,
                         levels: Map[Int, Array[Double]])

  /** Sketch COLUMN value: one `map<int, array<double>>` (the Rbm
    * convention — a single-column value keeps `udaf` input handling
    * trivial): keys ≥ 0 are levels (header-first arrays, trimmed),
    * meta keys -1/-2/-3 carry count/flips/k as exact doubles. */
  type Sk = Map[Int, Array[Double]]

  val DefaultK = 512

  def toSk(s: State): Sk =
    s.levels.collect { case (l, arr) if arr(0).toInt > 0 =>
      l -> java.util.Arrays.copyOf(arr, arr(0).toInt + 1)
    } ++ Map(-1 -> Array(s.count.toDouble), -2 -> Array(s.flips.toDouble),
      -3 -> Array(s.k.toDouble))

  def fromSk(m: Sk): State = State(
    m.get(-3).map(_(0).toInt).getOrElse(DefaultK),
    m.get(-1).map(_(0).toLong).getOrElse(0L),
    m.get(-2).map(_(0).toLong).getOrElse(0L),
    m.filter(_._1 >= 0))

  def empty(k: Int = DefaultK): State = State(k, 0L, 0L, Map.empty)

  private def append(arr: Array[Double], v: Double): Array[Double] = {
    val n = arr(0).toInt
    val out =
      if (n + 1 >= arr.length) java.util.Arrays.copyOf(arr, arr.length * 2)
      else arr
    out(n + 1) = v
    out(0) = (n + 1).toDouble
    out
  }

  private def newBuf(cap: Int): Array[Double] = {
    val a = new Array[Double](math.max(cap, 8)); a(0) = 0.0; a
  }

  /** Compact level `l` in place within `levels` if it holds ≥ k
    * values: sort, keep alternating elements (offset from the flip
    * counter) of the largest even prefix, push survivors to l+1.
    * Returns (new levels, new flips). */
  private def compact(levels: Map[Int, Array[Double]], l: Int, k: Int,
                      flips: Long): (Map[Int, Array[Double]], Long) = {
    val arr = levels(l)
    val n = arr(0).toInt
    if (n < k) return (levels, flips)
    java.util.Arrays.sort(arr, 1, n + 1)
    val even = n - (n & 1)
    val offset = 1 + (flips & 1L).toInt // 1-based: first or second element
    // survivors: every other element of the even prefix
    var up = levels.getOrElse(l + 1, newBuf(k + 8))
    var i = offset
    while (i <= even) { up = append(up, arr(i)); i += 2 }
    // remainder (odd leftover) stays at this level
    val rest = newBuf(k + 8)
    val kept = if ((n & 1) == 1) { rest(1) = arr(n); rest(0) = 1.0; rest } else rest
    val next = levels.updated(l, kept).updated(l + 1, up)
    compactFrom(next, l + 1, k, flips + 1)
  }

  private def compactFrom(levels: Map[Int, Array[Double]], l: Int, k: Int,
                          flips: Long): (Map[Int, Array[Double]], Long) =
    levels.get(l) match {
      case Some(a) if a(0).toInt >= k => compact(levels, l, k, flips)
      case _ => (levels, flips)
    }

  def update(s: State, v: Double): State = {
    val l0 = append(s.levels.getOrElse(0, newBuf(s.k + 8)), v)
    val (lv, fl) = compactFrom(s.levels.updated(0, l0), 0, s.k, s.flips)
    State(s.k, s.count + 1, fl, lv)
  }

  def merge(a: State, b: State): State = {
    if (a.count == 0) return b
    if (b.count == 0) return a
    val k = math.max(a.k, b.k)
    var levels = a.levels
    b.levels.foreach { case (l, arr) =>
      val n = arr(0).toInt
      var dst = levels.getOrElse(l, newBuf(k + 8))
      var i = 1
      while (i <= n) { dst = append(dst, arr(i)); i += 1 }
      levels = levels.updated(l, dst)
    }
    var flips = a.flips + b.flips
    var l = 0
    while (l <= (if (levels.isEmpty) -1 else levels.keys.max)) {
      val (lv2, fl2) = compactFrom(levels, l, k, flips)
      levels = lv2; flips = fl2
      l += 1
    }
    State(k, a.count + b.count, flips, levels)
  }

  /** Total stored weight Σ values·2^level — ≡ count by construction. */
  def weight(s: State): Long =
    s.levels.map { case (l, arr) => arr(0).toLong << l }.sum

  /** Quantile estimate: weighted selection over all stored values. */
  def quantile(s: State, q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
    if (s.count == 0) return Double.NaN
    val items = s.levels.toSeq.flatMap { case (l, arr) =>
      val n = arr(0).toInt
      (1 to n).map(i => (arr(i), 1L << l))
    }.sortBy(_._1)
    val total = items.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    items.foreach { case (v, w) =>
      cum += w
      if (cum >= target) return v
    }
    items.last._1
  }

  // ---- aggregators ---------------------------------------------------------

  private[functions] class QskOf(k: Int = DefaultK) extends Aggregator[Double, State, Sk] {
    override def zero: State = empty(k)
    override def reduce(b: State, v: Double): State = update(b, v)
    override def merge(a: State, b: State): State = Qsk.merge(a, b)
    override def finish(s: State): Sk = toSk(s)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Sk] = ExpressionEncoder[Sk]()
  }

  private[functions] class QskMerge extends Aggregator[Sk, State, Sk] {
    override def zero: State = empty()
    override def reduce(b: State, s: Sk): State = Qsk.merge(b, fromSk(s))
    override def merge(a: State, b: State): State = Qsk.merge(a, b)
    override def finish(s: State): Sk = toSk(s)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Sk] = ExpressionEncoder[Sk]()
  }

  private[functions] class QskOfQuantile(q: Double, k: Int = DefaultK)
      extends Aggregator[Double, State, Double] {
    override def zero: State = empty(k)
    override def reduce(b: State, v: Double): State = update(b, v)
    override def merge(a: State, b: State): State = Qsk.merge(a, b)
    override def finish(s: State): Double = quantile(s, q)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  private[functions] class QskMergeQuantile(q: Double) extends Aggregator[Sk, State, Double] {
    override def zero: State = empty()
    override def reduce(b: State, s: Sk): State = Qsk.merge(b, fromSk(s))
    override def merge(a: State, b: State): State = Qsk.merge(a, b)
    override def finish(s: State): Double = quantile(s, q)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** Sketch of a double column (the stored PERCENTILE pre-aggregate). */
  def qskOf(value: Column, k: Int = DefaultK): Column =
    udaf(new QskOf(k)).apply(value.cast("double"))

  /** Merge stored sketches (StarRocks percentile_union). */
  def qskMerge(sketch: Column): Column = udaf(new QskMerge).apply(sketch)

  /** Merge stored sketches and emit one quantile estimate
    * (percentile_union + percentile_approx_raw in one aggregate). */
  def qskMergeQuantile(sketch: Column, q: Double): Column =
    udaf(new QskMergeQuantile(q)).apply(sketch)

  /** Rows → one quantile estimate directly (build + extract fused) —
    * the streaming-window form: state is one bounded sketch per
    * group, merged associatively across micro-batch partials. */
  def qskQuantileAgg(value: Column, q: Double, k: Int = DefaultK): Column =
    udaf(new QskOfQuantile(q, k)).apply(value.cast("double"))

  /** Scalar quantile extraction from a STORED sketch map value —
    * [[QskQuantile]]'s eval body, shared with generated code. */
  def quantileOfMap(m: org.apache.spark.sql.catalyst.util.MapData,
                    q: Double): Double = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    var count = 0L
    var n = 0
    var i = 0
    while (i < m.numElements()) {
      val l = keys.getInt(i)
      if (l == -1) count = vals.getArray(i).getDouble(0).toLong
      else if (l >= 0) n += vals.getArray(i).getDouble(0).toInt
      i += 1
    }
    if (count == 0L || n == 0) return Double.NaN
    val items = new Array[Double](n)
    val weights = new Array[Long](n)
    var w = 0
    i = 0
    while (i < m.numElements()) {
      val l = keys.getInt(i)
      if (l >= 0) {
        val arr = vals.getArray(i)
        val cnt = arr.getDouble(0).toInt
        var j = 1
        while (j <= cnt) {
          items(w) = arr.getDouble(j); weights(w) = 1L << l; w += 1; j += 1
        }
      }
      i += 1
    }
    // sort items with their weights (indices by value)
    val order = (0 until n).sortBy(items(_))
    val total = weights.sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var oi = 0
    while (oi < n) {
      cum += weights(order(oi))
      if (cum >= target) return items(order(oi))
      oi += 1
    }
    items(order(n - 1))
  }
}

/** `percentile_approx_raw(sk, q)` — scalar quantile extraction from a
  * stored [[Qsk]] sketch column (the StarRocks function of the same
  * name over PERCENTILE values): any `q`, evaluated per row inside
  * whole-stage codegen — so stored daily sketches serve arbitrary
  * quantiles without re-aggregation. Registered by GraftExtensions
  * (q must be a literal in SQL).
  */
case class QskQuantile(child: org.apache.spark.sql.catalyst.expressions.Expression,
                       q: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "percentile_approx_raw"

  override def nullSafeEval(input: Any): Any =
    Qsk.quantileOfMap(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData], q)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Qsk.quantileOfMap($c, $q)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
