package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.DatasetShim
import graft.functions.BpeEncode

/** BPE tokenizer APPLY over word-level units: derive a rank-ordered
  * merge table from corpus pair counts (C34), replace ranked pairs
  * greedily per document, and assign deterministic token ids from the
  * post-merge vocabulary — the encode step every training pipeline
  * runs between raw text and token-id sequences.
  *
  * Scale shape:
  *  - the merge table is a TOP-K driver fetch (k rows, like the
  *    centroid fetches in ops.Similarity) — never row-scale;
  *  - encoding is one row-local native expression inside whole-stage
  *    codegen ([[graft.functions.BpeEncode]]) — the table ships with
  *    the task closure, no join, no shuffle of text;
  *  - the vocabulary is aggregated to VOCAB cardinality before its
  *    single-partition id numbering (distinct-first, like
  *    ops.Mixture's stratum aggregation), then joins back
  *    broadcast-eligible (AQE size-gates).
  */
object Bpe {

  /** Rank-ordered merge table: top-k adjacent word pairs by
    * (count desc, pair asc) — C34's statistic, made actionable.
    * Engine-deterministic (total tie order), replayable in SQL. */
  def mergeTable(df: DataFrame, text: Column, k: Int): Seq[(String, String)] =
    TextAnalysis.bpePairCounts(df, text, k).select(col("pair"))
      .collect().map { r =>
        val p = r.getString(0)
        val cut = p.indexOf(' ')
        (p.substring(0, cut), p.substring(cut + 1))
      }.toSeq

  /** Apply a merge table to a words-array column (row-local). */
  def encode(words: Column, merges: Seq[(String, String)]): Column =
    DatasetShim.column(BpeEncode(DatasetShim.expression(words), merges))

  /** Encode each document and explode to one row per token with a
    * deterministic id: (doc_id, seq, token, token_id), ids dense
    * 1..|vocab| in token lexicographic order.
    */
  def encodeWithIds(df: DataFrame, id: Column, text: Column,
                    merges: Seq[(String, String)]): DataFrame = {
    val toks = df
      .select(id.cast("long").as("doc_id"), encode(split(text, " "), merges).as("ts"))
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("seq0", "token")))
      .select(col("doc_id"), (col("seq0") + 1).cast("long").as("seq"), col("token"))
    // vocab-cardinality frame BEFORE the single-partition numbering
    // window; the id join back is broadcast-eligible
    val vocab = toks.select(col("token")).distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("token"))).cast("long"))
    toks.join(vocab, Seq("token"))
      .select(col("doc_id"), col("seq"), col("token"), col("token_id"))
  }
}
