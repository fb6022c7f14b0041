package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy contiguous sequence packing for training-batch assembly:
  * documents are laid out in a deterministic order within each stream
  * and cut into packs of `budgetTokens`, the unit a trainer fills a
  * context window from.
  *
  * Boundary rule (fixed-boundary greedy, overflow-tolerant): a doc
  * belongs to the pack its cumulative START offset falls in —
  * `pack_id = (cumsum − tokens) div budget` — so every pack except a
  * stream's last is filled to ≥ budget and at most one doc straddles
  * each boundary. This is the standard streaming-packing rule that
  * needs ONE window function; best-fit bin packing would need
  * iterative state and buys a few percent utilization.
  *
  * Scale shape: the only shuffle is the window partition. A bare
  * language stream is few-partition-skewed at corpus scale — pass a
  * composite `stream` (e.g. language × hash-bucket of the id space)
  * to spread the running sums; packs then parallelize per bucket with
  * unchanged semantics within each.
  */
object Packing {

  /** Per-doc pack assignment: (id, stream, n_tok, start offset in the
    * stream, pack_id). */
  def packContiguous(docs: DataFrame, streamCol: Column, idCol: Column,
                     tokensCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col("stream")).orderBy(col("id"))
    docs
      .select(idCol.as("id"), streamCol.as("stream"),
        tokensCol.cast("long").as("n_tok"))
      .withColumn("start_tok",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("pack_id", expr(s"start_tok div ${budgetTokens}L"))
  }

  /** Pack-level utilization summary: docs, tokens, fill ratio (the
    * straddling doc's overflow counts toward its own pack, so fill
    * can exceed 1 on boundary packs). */
  def packStats(packed: DataFrame, budgetTokens: Long): DataFrame =
    packed.groupBy(col("stream"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"))
      .withColumn("fill",
        graft.functions.Rounding.r(col("n_tok") / lit(budgetTokens.toDouble), 4))

  /** Sliding-window chunking: each document's token stream cut into
    * chunks of `chunkTokens` starting every `stride` tokens
    * (stride < chunk → overlapping context windows, the standard
    * training-example construction). Chunk starts are every multiple
    * of `stride` below the token count; a document's final chunks may
    * run short. Output is one row per (doc, chunk) with the chunk
    * identified by md5 of its joined tokens — compact at any scale
    * (chunk text itself never leaves the expression).
    *
    * Scale shape: row-local explode, no shuffle at all — chunk rows
    * inherit the scan's partitioning; output size ∝ tokens/stride.
    */
  def chunkSliding(docs: DataFrame, idCol: Column, textCol: Column,
                   chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    docs.select(idCol.as("doc_id"), split(textCol, " ").as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long"),
        least(size(col("toks")) - col("start_tok"), lit(chunkTokens))
          .cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), col("start_tok") + 1, lit(chunkTokens)))).as("chunk_hash"))
  }
}
