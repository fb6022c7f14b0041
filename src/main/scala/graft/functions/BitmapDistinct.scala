package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distinct-count of a bounded non-negative long key via a fixed
  * bitmap — the StarRocks `bitmap_union_count` analogue.
  *
  * Unlike `count(distinct x)` (which expands to a two-phase
  * shuffle-dedup of the raw keys), the bitmap buffer OR-merges
  * map-side, so the shuffle carries `capacity/8` bytes per group
  * regardless of row count — the right trade when the key domain is
  * dense and bounded (user ids, date ordinals, enum codes). Exact, so
  * a `count(DISTINCT …)` oracle must match it bit for bit.
  *
  * @param capacity exclusive upper bound on key values; out-of-range
  *                 keys throw (choose the domain bound explicitly)
  */
class BitmapDistinct(capacity: Int) extends Aggregator[Long, Array[Long], Long] {
  private val words = (capacity + 63) >>> 6

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    require(v >= 0 && v < capacity, s"key $v outside bitmap capacity $capacity")
    buf((v >>> 6).toInt) |= 1L << (v & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[BitmapDistinct]] that RETURNS the bitmap (long words) instead of
  * its popcount — the mergeable-bitmap value StarRocks' `bitmap_union`
  * exposes: downstream set algebra (AND/OR/ANDNOT + popcount) runs as
  * plain array expressions on the buffers, no re-scan of the rows. */
class BitmapOf(capacity: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val inner = new BitmapDistinct(capacity)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], v: Long): Array[Long] = inner.reduce(buf, v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BitmapDistinct {
  /** Column function: exact distinct count of `key` (0 ≤ key < capacity). */
  def bitmapDistinct(key: Column, capacity: Int = 1 << 24): Column =
    udaf(new BitmapDistinct(capacity)).apply(key)

  /** Column function: the bitmap itself as `array<long>` words. */
  def bitmapOf(key: Column, capacity: Int = 1 << 24): Column =
    udaf(new BitmapOf(capacity)).apply(key)

  /** Popcount of the word-wise AND of two equal-capacity bitmaps —
    * `bitmap_and_count`: |A ∩ B| without touching the row data again. */
  def bitmapAndCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
  }
}
