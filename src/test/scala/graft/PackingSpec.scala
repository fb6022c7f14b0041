package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Fixed-boundary greedy sequence packing: boundary rule, stream
  * isolation, utilization stats. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // stream a: 600 + 600 + 600 → packs 0, 0 (straddles), 1
    (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L),
    // stream b: isolated numbering from a
    (10L, "b", 1024L), (11L, "b", 1L),
    // stream c: one giant doc spans several budgets — its own pack
    (20L, "c", 5000L), (21L, "c", 10L)
  ).toDF("id", "s", "t")

  test("pack id is the integer div of the cumulative start offset") {
    val got = Packing.packContiguous(docs, col("s"), col("id"), col("t"), 1024L)
      .select(col("id"), col("start_tok"), col("pack_id"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, s, p) => i -> (s, p) }.toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((600L, 0L)))    // straddles the boundary, stays in pack 0
    assert(got(3L) == ((1200L, 1L)))
    assert(got(10L) == ((0L, 0L)))     // stream b restarts at 0
    assert(got(11L) == ((1024L, 1L)))  // exact boundary opens pack 1
    assert(got(20L) == ((0L, 0L)))
    assert(got(21L) == ((5000L, 4L)))  // after the giant doc
  }

  test("pack stats report fill ratio, overflow on boundary packs") {
    val packed = Packing.packContiguous(docs, col("s"), col("id"), col("t"), 1024L)
    val stats = Packing.packStats(packed, 1024L)
      .select(col("stream"), col("pack_id"), col("n_docs"), col("n_tok"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats.contains(("a", 0L, 2L, 1200L)))  // overfilled boundary pack
    assert(stats.contains(("a", 1L, 1L, 600L)))
    assert(stats.contains(("c", 0L, 1L, 5000L)))
  }

  test("sliding-window chunking: starts, lengths, overlap, empty docs") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "solo"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Packing.chunkSliding(d, col("doc_id"), col("text"),
        chunkTokens = 4, stride = 3)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("n_tok"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: starts 0,3,6,9 → lengths 4,4,4,1
    assert(got == Set(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 1L),
      // split("") yields [""] (one empty token), not an empty array —
      // a zero-length doc still emits its one (empty) chunk
      (3L, 0L, 0L, 1L)))
    // overlap: chunk 0 covers tokens 1..4, chunk 1 covers 4..7 — the
    // shared token makes the hashes of equal-content windows equal
    val h = Packing.chunkSliding(d.where(col("doc_id") === 1), col("doc_id"),
        col("text"), chunkTokens = 4, stride = 3)
      .select(col("chunk_hash")).as[String].collect()
    assert(h.distinct.length == h.length) // distinct windows hash apart
  }
}
