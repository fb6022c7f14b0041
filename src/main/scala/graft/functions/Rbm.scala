package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Roaring-shaped compressed bitmap over an UNBOUNDED non-negative long
  * id domain — the StarRocks `BITMAP` type analogue
  * (`/root/reference/create-starrocks-tables.sh` models cohorts with
  * roaring-compressed `BITMAP` columns for exactly this reason).
  *
  * Representation: the id space is bucketed by `id >>> 16`; each
  * occupied bucket holds ONE container over the 2¹⁶ in-bucket offsets:
  *
  *  - **array container** — sorted distinct offsets, used while the
  *    bucket holds ≤ 1023 ids (size ∝ cardinality);
  *  - **bitmap container** — 1024 dense words (8 KiB), used when the
  *    bucket is dense (≥ 1024 ids).
  *
  * The two are discriminated by length alone (a bitmap container has
  * exactly `DenseWords` = 1024 longs; array containers never grow past
  * 513), so the value is a plain `map<long, array<long>>` Catalyst
  * column and ALL set algebra below is native column expressions —
  * no UDF touches the query path after aggregation.
  *
  * Scale shape: the aggregation buffer OR-merges map-side, so the
  * partial→final shuffle carries bytes ∝ OCCUPIED BUCKETS (≤ 8 KiB
  * per occupied bucket, ∝ cardinality for sparse buckets) — never
  * ∝ the id DOMAIN. Ids at 2⁶³ cost the same as ids at 2¹⁰; there is
  * no capacity parameter to outgrow. Compare [[BitmapDistinct]], the
  * fixed-capacity dense variant kept for bounded enum-like domains.
  *
  * Canonical form: `finish` emits buckets in ascending order, each
  * container exact (sorted distinct offsets, or dense iff the bucket
  * has ≥ 1024 ids) — byte-identical regardless of row order or
  * partitioning, so values can be compared/hashed directly.
  */
object Rbm {
  /** Bitmap value/buffer type: bucket (id >>> 16) → container. */
  type Bm = Map[Long, Array[Long]]

  /** Words in a dense container (2¹⁶ bits). */
  val DenseWords = 1024
  /** Max values an in-flight array container holds (len ≤ 513 < 1024,
    * so buffer containers are also length-discriminated). */
  private val MaxArrayCap = 512
  /** Unique count at which a full array container upgrades to dense. */
  private val UpgradeAt = 480

  // ---- container internals -------------------------------------------------
  // Buffer array containers carry a header: arr(0) = n, values (possibly
  // unsorted, possibly duplicated) in arr(1..n) — appends are O(1) and
  // sort+dedupe runs amortized, only when the container fills.

  private def newArrayContainer(off: Int): Array[Long] = {
    val a = new Array[Long](9); a(0) = 1L; a(1) = off.toLong; a
  }

  private def setBit(words: Array[Long], off: Int): Unit =
    words(off >>> 6) |= 1L << (off & 63)

  /** Sort+dedupe arr(1..n) in place; rewrites arr(0); returns unique count. */
  private def normalize(arr: Array[Long]): Int = {
    val n = arr(0).toInt
    if (n == 0) return 0
    java.util.Arrays.sort(arr, 1, n + 1)
    var w = 1
    var i = 2
    while (i <= n) {
      if (arr(i) != arr(w)) { w += 1; arr(w) = arr(i) }
      i += 1
    }
    arr(0) = w.toLong
    w
  }

  private def toDense(arr: Array[Long]): Array[Long] = {
    val d = new Array[Long](DenseWords)
    val n = arr(0).toInt
    var i = 1
    while (i <= n) { setBit(d, arr(i).toInt); i += 1 }
    d
  }

  /** Add one offset; returns the container to store (same ref when it
    * mutated in place, else a grown/upgraded replacement). */
  private def append(c: Array[Long], off: Int): Array[Long] = {
    if (c.length == DenseWords) { setBit(c, off); c }
    else {
      var arr = c
      if (arr(0).toInt + 1 >= arr.length) { // full → amortized maintenance
        val u = normalize(arr)
        if (u >= UpgradeAt) {
          val d = toDense(arr); setBit(d, off); return d
        }
        if (u * 4 > (arr.length - 1) * 3) { // still >75% full after dedupe
          if (arr.length - 1 >= MaxArrayCap) { // can't grow → bucket is dense-bound
            val d = toDense(arr); setBit(d, off); return d
          }
          val g = new Array[Long](math.min(MaxArrayCap, (arr.length - 1) * 2) + 1)
          System.arraycopy(arr, 0, g, 0, u + 1)
          arr = g
        }
      }
      val n = arr(0).toInt
      arr(n + 1) = off.toLong
      arr(0) = (n + 1).toLong
      arr
    }
  }

  /** OR-merge container b into a (either may be mutated/consumed). */
  private def mergeContainers(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == DenseWords && b.length == DenseWords) {
      var i = 0; while (i < DenseWords) { a(i) |= b(i); i += 1 }; a
    } else if (a.length == DenseWords) {
      val n = b(0).toInt
      var i = 1; while (i <= n) { setBit(a, b(i).toInt); i += 1 }; a
    } else if (b.length == DenseWords) {
      val n = a(0).toInt
      var i = 1; while (i <= n) { setBit(b, a(i).toInt); i += 1 }; b
    } else {
      var r = a
      val n = b(0).toInt
      var i = 1; while (i <= n) { r = append(r, b(i).toInt); i += 1 }
      r
    }

  /** Exact canonical form: sorted distinct offsets, dense iff ≥ 1024. */
  private def canonicalContainer(c: Array[Long]): Array[Long] =
    if (c.length == DenseWords) {
      var u = 0
      var i = 0
      while (i < DenseWords) { u += java.lang.Long.bitCount(c(i)); i += 1 }
      if (u >= 1024) c
      else {
        val out = new Array[Long](u)
        var w = 0
        var word = 0
        while (word < DenseWords) {
          var bits = c(word)
          while (bits != 0) {
            out(w) = word.toLong * 64 + java.lang.Long.numberOfTrailingZeros(bits)
            w += 1
            bits &= bits - 1
          }
          word += 1
        }
        out
      }
    } else {
      val u = normalize(c)
      java.util.Arrays.copyOfRange(c, 1, u + 1)
    }

  private def containerCardinality(c: Array[Long]): Long =
    if (c.length == DenseWords) {
      var u = 0L
      var i = 0
      while (i < DenseWords) { u += java.lang.Long.bitCount(c(i)); i += 1 }
      u
    } else normalize(c).toLong

  // ---- aggregators ---------------------------------------------------------

  /** Shared build/merge; subclasses choose the finish shape. */
  abstract class RbmAggBase[OUT] extends Aggregator[Long, Bm, OUT] {
    final override def zero: Bm = Map.empty

    final override def reduce(buf: Bm, v: Long): Bm = {
      require(v >= 0, s"bitmap ids must be non-negative, got $v")
      val bucket = v >>> 16
      val off = (v & 0xFFFF).toInt
      buf.get(bucket) match {
        case Some(c) =>
          val c2 = append(c, off)
          if (c2 eq c) buf else buf.updated(bucket, c2)
        case None => buf.updated(bucket, newArrayContainer(off))
      }
    }

    final override def merge(a: Bm, b: Bm): Bm = mergeBm(a, b)

    final override def bufferEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
  }

  private def mergeBm(a: Bm, b: Bm): Bm = {
    // fold the smaller side into the larger one
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (bucket, c)) =>
      acc.get(bucket) match {
        case Some(c0) =>
          val m = mergeContainers(c0, c)
          if (m eq c0) acc else acc.updated(bucket, m)
        case None => acc.updated(bucket, c)
      }
    }
  }

  /** CANONICAL container ([[canonicalContainer]]: headerless sorted
    * offsets, or dense words) → build form ([[append]]/
    * [[mergeContainers]]'s headered shape). Copies, so merge-in-place
    * never mutates a deserialized input row. Length discriminates
    * losslessly: canonical arrays hold ≤ [[MaxArrayCap]] = 512 values,
    * dense is exactly [[DenseWords]] = 1024. */
  private def buildForm(c: Array[Long]): Array[Long] =
    if (c.length == DenseWords) c.clone()
    else {
      val a = new Array[Long](c.length + 1)
      a(0) = c.length.toLong
      System.arraycopy(c, 0, a, 1, c.length)
      a
    }

  /** Union-merge of PRE-BUILT bitmaps to an exact distinct count — the
    * BITMAP_UNION(_COUNT) rollup aggregate StarRocks runs over stored
    * BITMAP columns: rows are bitmaps (from [[rbmOf]]), never raw ids,
    * so a rollup re-aggregates sketch-sized state instead of
    * re-scanning events. Shuffle carries ≤ one bitmap per partition
    * per group (partial-merge), each bitmap ∝ occupied 2¹⁶ buckets. */
  class RbmUnionCount extends Aggregator[Bm, Bm, Long] {
    override def zero: Bm = Map.empty
    override def reduce(buf: Bm, v: Bm): Bm =
      mergeBm(buf, v.map { case (k, c) => k -> buildForm(c) })
    override def merge(a: Bm, b: Bm): Bm = mergeBm(a, b)
    override def finish(buf: Bm): Long =
      buf.valuesIterator.map(containerCardinality).sum
    override def bufferEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Returns the canonical compressed bitmap (`map<long, array<long>>`). */
  class RbmOf extends RbmAggBase[Bm] {
    override def finish(buf: Bm): Bm = {
      val sorted = buf.toSeq.sortBy(_._1)
        .map { case (k, c) => k -> canonicalContainer(c) }
      scala.collection.immutable.ListMap(sorted: _*)
    }
    override def outputEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
  }

  /** Returns the exact distinct count (`bitmap_union_count` analogue). */
  class RbmDistinct extends RbmAggBase[Long] {
    override def finish(buf: Bm): Long =
      buf.valuesIterator.map(containerCardinality).sum
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Union of BITMAP rows, returned as a canonical bitmap (`bitmap_union`
    * analogue) — merging partial bitmaps (e.g. a base posting list with
    * its delta postings) without decoding to ids. */
  class RbmUnion extends Aggregator[Bm, Bm, Bm] {
    override def zero: Bm = Map.empty
    override def reduce(buf: Bm, v: Bm): Bm =
      mergeBm(buf, v.map { case (k, c) => k -> buildForm(c) })
    override def merge(a: Bm, b: Bm): Bm = mergeBm(a, b)
    override def finish(buf: Bm): Bm = {
      val sorted = buf.toSeq.sortBy(_._1)
        .map { case (k, c) => k -> canonicalContainer(c) }
      scala.collection.immutable.ListMap(sorted: _*)
    }
    override def bufferEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
    override def outputEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
  }

  // ---- column API ----------------------------------------------------------

  /** Aggregate: the compressed bitmap of `key` (any non-negative long). */
  def rbmOf(key: Column): Column = udaf(new RbmOf).apply(key)

  /** Aggregate: exact distinct count of `key` via the compressed bitmap. */
  def rbmDistinct(key: Column): Column = udaf(new RbmDistinct).apply(key)

  /** Aggregate over BITMAP rows: union-merged exact distinct count. */
  def rbmUnionCount(bitmap: Column): Column = udaf(new RbmUnionCount).apply(bitmap)

  /** Aggregate over BITMAP rows: the union as a canonical bitmap. */
  def rbmUnion(bitmap: Column): Column = udaf(new RbmUnion).apply(bitmap)

  private def isDense(c: Column): Column = size(c) === DenseWords

  private def denseCardinality(c: Column): Column =
    aggregate(transform(c, w => bit_count(w).cast("long")), lit(0L), (a, x) => a + x)

  private def containerCard(c: Column): Column =
    when(isDense(c), denseCardinality(c)).otherwise(size(c).cast("long"))

  /** Membership test of offset `v` in a dense container. */
  private def hasBit(dense: Column, v: Column): Column =
    element_at(dense, shiftright(v, 6).cast("int") + 1)
      .bitwiseAND(call_function("shiftleft", lit(1L), (v % 64).cast("int"))) =!= lit(0L)

  /** |bm| — popcount of a compressed bitmap, pure column math. */
  def cardinality(bm: Column): Column =
    aggregate(transform(map_values(bm), c => containerCard(c)), lit(0L), (a, x) => a + x)

  /** A ∩ B as a BITMAP (`bitmap_and` analogue) — same per-bucket
    * container dispatch as [[andCardinality]] but keeps the result:
    * dense∧dense word AND, dense∧array bit-probe filter, array∧array
    * `array_intersect`; emptied buckets are dropped. The result is a
    * VALID bitmap for all functions here but not necessarily CANONICAL
    * (a dense container may survive with < 1024 ids), so feed it to
    * [[cardinality]]/[[toIds]]/further algebra — don't hash-compare it
    * against aggregator output. */
  def andBm(a: Column, b: Column): Column =
    map_filter(
      map_zip_with(a, b, (_, c1, c2) =>
        when(c1.isNull || c2.isNull, array().cast("array<long>"))
          .when(isDense(c1) && isDense(c2),
            zip_with(c1, c2, (x, y) => x.bitwiseAND(y)))
          .when(isDense(c1), filter(c2, v => hasBit(c1, v)))
          .when(isDense(c2), filter(c1, v => hasBit(c2, v)))
          .otherwise(array_intersect(c1, c2))),
      (_, c) => containerCard(c) > 0)

  /** All member ids of a bitmap as a SORTED array<long> — the
    * materialization step after set algebra (e.g. posting-list
    * intersection → candidate ids). Dense containers decode by
    * filtering the 2¹⁶ offset range, so cost is ∝ 65536 per dense
    * bucket — use on query-sized results, not corpus-sized bitmaps. */
  def toIds(bm: Column): Column =
    flatten(transform(array_sort(map_entries(bm)), e => {
      val bucket = e("key")
      val c = e("value")
      val offs = when(isDense(c),
        filter(sequence(lit(0L), lit(65535L)), v => hasBit(c, v)))
        .otherwise(c)
      transform(offs, v => bucket * lit(65536L) + v)
    }))

  /** |A ∩ B| (`bitmap_and_count` analogue) without re-scanning rows:
    * per-bucket dense∧dense word AND, dense∧array bit probes, or
    * array∧array `array_intersect` — all native Catalyst expressions.
    * (|A ∪ B| = |A|+|B|−|A∩B| and |A∖B| = |A|−|A∩B| derive from it.) */
  def andCardinality(a: Column, b: Column): Column =
    aggregate(
      map_values(map_zip_with(a, b, (_, c1, c2) =>
        when(c1.isNull || c2.isNull, lit(0L))
          .when(isDense(c1) && isDense(c2),
            aggregate(zip_with(c1, c2, (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
              lit(0L), (s, x) => s + x))
          .when(isDense(c1), size(filter(c2, v => hasBit(c1, v))).cast("long"))
          .when(isDense(c2), size(filter(c1, v => hasBit(c2, v))).cast("long"))
          .otherwise(size(array_intersect(c1, c2)).cast("long")))),
      lit(0L), (s, x) => s + x)
}
