package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012) — the
  * StarRocks/ClickHouse `approx_top_k` family's workhorse.
  *
  * The sketch keeps at most `k` counters. Its guarantee after any
  * sequence of reduces and merges (merge order immaterial):
  * every item with true frequency > n/(k+1) is present, and each
  * kept counter undercounts its item by at most n/(k+1), where n is
  * the total items seen. The shuffle therefore carries ≤ k counters
  * per group instead of the full item domain.
  *
  * The OUTPUT of the sketch alone is approximate and merge-order
  * dependent, so it can never be hash-checked cross-engine. The
  * deterministic pattern (used by `q_heavy_hitters`) is
  * sketch-as-prune: candidates = MG(k) — a superset of the true
  * heavies by the guarantee above — then an exact count of only the
  * candidates and a threshold filter reproduce the EXACT heavy-hitter
  * set. Same shape as LSH-then-verify dedup: the sketch bounds the
  * work, the verify pass restores exactness.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        // decrement every counter, drop zeros (the classic MG step)
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  /** PODS'12 merge: sum counters, then if over capacity subtract the
    * (k+1)-largest count from every counter and drop non-positives —
    * preserves the undercount bound additively. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toArray.sortBy(-_).apply(k) // (k+1)-th largest
      summed.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Column function: MG sketch of `item` with capacity k — a
    * map<item, lower-bound-count> containing every item whose true
    * frequency exceeds n/(k+1). */
  def mgSketch(item: Column, k: Int): Column =
    udaf(new HeavyHitters(k)).apply(item)
}
