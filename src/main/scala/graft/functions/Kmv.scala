package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k theta) distinct-value sketch —
  * the SET-EXPRESSION member of the mergeable-sketch-column family,
  * beside the HLL rollup (B57: union-only), the exact Rbm bitmap
  * (B58: every set op but state ∝ distinct ids), and the Qsk quantile
  * sketch (B69). Construction is the classic bottom-k estimator
  * (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07; the Apache
  * DataSketches "theta sketch" is the same idea generalized): keep
  * the k smallest DISTINCT 63-bit hashes of the input values.
  *
  * Why it earns a seat: HLL cannot estimate |A∩B| without the
  * inclusion–exclusion blowup (error grows with |A∪B|, catastrophic
  * for small intersections of large sets), and exact bitmaps carry
  * state proportional to the id universe. KMV keeps O(k) state per
  * group and answers EVERY set expression with bounded relative
  * error ~1/√(k−2): the k smallest hashes of A∪B are a uniform
  * sample of the union, so intersection/Jaccard are estimated by
  * counting sample hits below the pooled threshold θ = min(θ_A, θ_B).
  *
  * Determinism: the distinct-bottom-k of a multiset does not depend
  * on arrival or merge order, so (unlike Qsk, whose compaction is
  * order-sensitive) KMV sketch VALUES are bit-stable under any
  * partitioning — spec-pinned. Estimates are still engine-internal
  * (no second engine replays the hash), so the gate query emits
  * exact values + error-bound flags (the B22/B42 construction).
  *
  * Scale shape: the aggregation buffer is an Array[Long] capped at
  * 4k entries (amortized compaction: sort + dedupe + keep bottom k),
  * so shuffles carry ≤ ~32 KB per group at the default k=1024 —
  * a per-group rollup over 100 TB moves sketches, never rows.
  *
  * Reference analogue: StarRocks' DISTINCT-combinator workloads on
  * the CDC-materialized tables (mysql-cdc-debezium-starrocks
  * benchmark.sh reconciliation counts); the set-expression form is
  * what its HLL/BITMAP columns cannot give at bounded state.
  */
object Kmv {

  val DefaultK = 1024

  /** 2^63 as a double — the hash domain [0, 2^63) mapped to (0, 1]. */
  val Max63: Double = 9.223372036854775807e18

  /** Uniform 63-bit hash of any column: xxhash64 with the sign bit
    * masked (uniform 64-bit → uniform 63-bit). Codegen'd native
    * expression — no UDF in the row path. */
  def hash63(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(Long.MaxValue))

  // ---- buffer: arr(0) = live entry count, entries follow unsorted;
  // compacted on overflow to the sorted distinct bottom-k ----

  private def append(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    val b = if (buf(0).toInt + 1 > 4 * k) compact(buf, k) else buf
    val n = b(0).toInt
    val out =
      if (n + 1 >= b.length) java.util.Arrays.copyOf(b, math.max(8, b.length * 2))
      else b
    out(n + 1) = v
    out(0) = n + 1
    out
  }

  /** Sorted distinct bottom-k of the buffered entries, header-first.
    * Keeping only the k smallest distinct hashes seen so far is exact
    * for the final bottom-k: an evicted hash was larger than k
    * distinct others, so it can never re-enter. */
  private def compact(buf: Array[Long], k: Int): Array[Long] = {
    val n = buf(0).toInt
    val vals = java.util.Arrays.copyOfRange(buf, 1, n + 1)
    java.util.Arrays.sort(vals)
    var m = 0
    var i = 0
    while (i < vals.length) {
      if (m == 0 || vals(m - 1) != vals(i)) { vals(m) = vals(i); m += 1 }
      i += 1
    }
    val keep = math.min(k, m)
    val out = new Array[Long](keep + 1)
    out(0) = keep
    System.arraycopy(vals, 0, out, 1, keep)
    out
  }

  private def mergeBuf(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val na = a(0).toInt; val nb = b(0).toInt
    val out = new Array[Long](na + nb + 1)
    out(0) = na + nb
    System.arraycopy(a, 1, out, 1, na)
    System.arraycopy(b, 1, out, na + 1, nb)
    compact(out, k)
  }

  /** Shared build/merge over 63-bit hash inputs; subclasses choose the
    * finish shape (the Rbm/Qsk aggregator pattern). */
  abstract class KmvAggBase[OUT](k: Int) extends Aggregator[Long, Array[Long], OUT] {
    final override def zero: Array[Long] = Array(0L)
    final override def reduce(buf: Array[Long], v: Long): Array[Long] =
      append(buf, v, k)
    final override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeBuf(a, b, k)
    final override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** rows → sketch: the stored pre-aggregate (sorted distinct
    * bottom-k hashes, ascending, NO header — a plain array column). */
  class KmvOf(k: Int = DefaultK) extends KmvAggBase[Array[Long]](k) {
    override def finish(buf: Array[Long]): Array[Long] = {
      val c = compact(buf, k)
      java.util.Arrays.copyOfRange(c, 1, c(0).toInt + 1)
    }
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** rows → distinct-count estimate: exact below k distincts, else
    * the unbiased (k−1)/θ_k estimator. */
  class KmvDistinct(k: Int = DefaultK) extends KmvAggBase[Long](k) {
    override def finish(buf: Array[Long]): Long = {
      val c = compact(buf, k)
      val m = c(0).toInt
      if (m < k) m.toLong
      else math.round((k - 1) / (c(k) / Max63))
    }
    override def outputEncoder: Encoder[Long] = Encoders0.long
  }

  private object Encoders0 {
    val long: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
  }

  /** STORED sketch columns → their union sketch (the rollup verb, the
    * B57/B58/B69 `*_union` shape): because distinct-bottom-k is
    * order-free, merging per-partition sketches is BIT-IDENTICAL to
    * sketching the concatenated input — re-aggregation carries ≤ k
    * longs per group, never rows (spec-pinned). */
  class KmvMerge(k: Int = DefaultK)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array(0L)
    override def reduce(buf: Array[Long], sk: Array[Long]): Array[Long] = {
      // a NULL sketch row (outer-join miss, never-written column) is
      // an empty set — skip it instead of NPEing on sk.length
      if (sk == null) return buf
      val wrapped = new Array[Long](sk.length + 1)
      wrapped(0) = sk.length
      System.arraycopy(sk, 0, wrapped, 1, sk.length)
      mergeBuf(buf, wrapped, k)
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeBuf(a, b, k)
    override def finish(buf: Array[Long]): Array[Long] = {
      val c = compact(buf, k)
      java.util.Arrays.copyOfRange(c, 1, c(0).toInt + 1)
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column helpers (udaf over the typed aggregators). */
  def kmvOf(hash63Col: Column, k: Int = DefaultK): Column =
    udaf(new KmvOf(k)).apply(hash63Col)
  def kmvDistinct(hash63Col: Column, k: Int = DefaultK): Column =
    udaf(new KmvDistinct(k)).apply(hash63Col)
  def kmvMerge(skCol: Column, k: Int = DefaultK): Column =
    udaf(new KmvMerge(k)).apply(skCol)

  // ---- set expressions over SKETCH COLUMNS — pure native Catalyst
  // array functions on the (tiny, post-aggregation) sketch frame ----

  /** θ of a sketch column as a fraction of the hash domain: 1.0 when
    * the sketch holds fewer than k hashes (it is then exact). */
  def thetaFrac(sk: Column, k: Int = DefaultK): Column =
    when(size(sk) < k, lit(1.0))
      .otherwise(element_at(sk, k).cast("double") / lit(Max63))

  /** Distinct estimate from a STORED sketch column ((k−1)/θ). */
  def distinctEst(sk: Column, k: Int = DefaultK): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / thetaFrac(sk, k))

  /** Hashes of `sk` below the pooled threshold `cutFrac` — the
    * uniform union sample both pair estimators count over. */
  def below(sk: Column, cutFrac: Column): Column =
    filter(sk, h => h.cast("double") < cutFrac * lit(Max63))

  /** |A∩B| estimate from two sketch columns. */
  def intersectEst(ska: Column, skb: Column, k: Int = DefaultK): Column = {
    val cut = least(thetaFrac(ska, k), thetaFrac(skb, k))
    size(array_intersect(below(ska, cut), below(skb, cut))).cast("double") / cut
  }

  /** |A∪B| estimate from two sketch columns. */
  def unionEst(ska: Column, skb: Column, k: Int = DefaultK): Column = {
    val cut = least(thetaFrac(ska, k), thetaFrac(skb, k))
    size(array_union(below(ska, cut), below(skb, cut))).cast("double") / cut
  }

  /** Jaccard estimate — the ratio estimator over the pooled sample
    * (hits-in-both / hits-in-either below θ). */
  def jaccardEst(ska: Column, skb: Column, k: Int = DefaultK): Column = {
    val cut = least(thetaFrac(ska, k), thetaFrac(skb, k))
    val sa = below(ska, cut); val sb = below(skb, cut)
    size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)).cast("double"), lit(1.0))
  }
}
