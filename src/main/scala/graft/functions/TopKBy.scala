package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation (StarRocks per-group TOPN / Hive
  * collect_topk shape): keeps the k largest (score, id) pairs —
  * score descending, ties to the SMALLEST id — in a fixed-size
  * buffer, merged map-side. The shuffle carries ≤ k pairs per
  * partition per group; a window row_number() over the same data
  * sorts the whole group's pair stream through one task.
  *
  * EXACT, not a sketch: top-k by a total order is associative, so
  * partial buffers merge losslessly and the result hash-matches a
  * window-rank oracle (same tie-break).
  */
class TopKBy(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // descending score, ascending id on ties — matches ORDER BY score DESC, id
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    // cheap pre-filter: skip values that cannot enter a full buffer
    if (buf.size >= k && !better(v, buf.last)) buf
    else trim(buf :+ v)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKBy {
  /** Column function: top-k (score, id) pairs of a group, score
    * descending with ascending-id tie-break, as an array of structs
    * `(_1 score, _2 id)` already in rank order. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    udaf(new TopKBy(k)).apply(score, id)
}
