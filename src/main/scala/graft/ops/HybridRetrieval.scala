package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Rounding

/** Hybrid lexical + semantic retrieval with Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher SIGIR'09) — the standard two-tower
  * search shape of a training-data curation / RAG stack: a sparse
  * (idf-weighted token overlap, i.e. BM25 with tf saturated to 1)
  * ranking and a dense (embedding cosine) ranking are computed
  * independently, each list is cut to its top-N, and candidates are
  * fused by rrf(d) = Σ_lists 1/(c + rank_d) with the published c=60.
  * RRF needs no score calibration between the legs — only ranks —
  * which is exactly why it is the production default for fusing
  * heterogeneous retrievers.
  *
  * Scale shape: the query side of BOTH legs is broadcast (queries
  * are a sampled, bounded set); the corpus side streams through one
  * token equi-join (sparse leg — shuffle ∝ matched postings, the
  * inverted-index shape) and one broadcast cosine scan (dense leg,
  * same plan as ann_topk_bruteforce — the IVF/graph variants are the
  * corpus-scale path, C8/C68). Each leg cuts to top-`listN` per
  * query BEFORE the fusion join, so the fusion frame is ≤ 2·listN
  * rows per query regardless of corpus size.
  *
  * Determinism: the sparse leg sums per-token idf PRE-ROUNDED to
  * 1e-4 integer units (Σ-order-free by construction — the exact-
  * integer-basis discipline of q_interpolate/dedup_source_overlap);
  * the dense leg ranks on 4dp-rounded cosines with id tie-breaks;
  * RRF scores are exact rationals of integer ranks, IEEE-identical
  * cross-engine.
  *
  * Reference analogue: the OLAP serving role of the StarRocks tables
  * (mysql-cdc-debezium-starrocks docs/ARCHITECTURE.md) extended with
  * the retrieval surface its users pair the warehouse with.
  */
object HybridRetrieval {

  /** Fused top-k over a documents frame (id, text — whitespace
    * tokens) and an embeddings frame (id, vector), joined by id.
    *
    * @param isQuery  deterministic query-set predicate on the id
    * @param k        fused results per query
    * @param listN    per-leg candidate-list depth before fusion
    * @param rrfC     the RRF constant (60 in the paper)
    * @param eligible optional CANDIDATE filter — an id frame (column
    *                 `id`); when given, both legs rank eligible
    *                 candidates only (the filter + hybrid query), while
    *                 queries may come from anywhere and idf stays
    *                 corpus-wide (the production convention: the
    *                 index's document frequencies, not the slice's)
    */
  def rrfTopk(docs: DataFrame, docId: Column, text: Column,
              embs: DataFrame, vecId: Column, vec: Column,
              isQuery: Column => Column, k: Int = 5, listN: Int = 20,
              rrfC: Int = 60, eligible: Option[DataFrame] = None): DataFrame = {

    // ---- sparse leg: idf-weighted shared-token score ----
    val dtAll = docs.select(docId.as("id"), explode(split(text, " ")).as("t")).distinct()
    val dt = eligible.map(e => dtAll.join(e.select(col("id")), Seq("id"), "left_semi"))
      .getOrElse(dtAll)
    val nDocs = docs.select(countDistinct(docId).cast("double").as("nd"))
    val df = dtAll.groupBy(col("t")).agg(count(lit(1)).cast("double").as("dft"))
    val qt = dtAll.where(isQuery(col("id")))
      .select(col("id").as("qid"), col("t"))
    // per-token idf pre-rounded to 1e-4 UNITS and summed as LONGS:
    // integer addition commutes exactly, so the per-pair score is
    // Σ-order-free — a rank can only move if a single token's ln()
    // differs by an ulp ACROSS ENGINES at its own rounding boundary,
    // the smallest possible amplification (the r12-advice fix; a
    // 4dp-rounded FP Σ was order-dependent, and here a boundary flap
    // changes RANKS, which the fusion then amplifies)
    val idfU = floor(log(lit(1.0) +
      (col("nd") - col("dft") + lit(0.5)) / (col("dft") + lit(0.5))) *
      lit(1e4) + lit(0.5)).cast("long")
    val lex = qt.join(dt, "t")
      .where(col("id") =!= col("qid"))
      .join(df, "t")
      .crossJoin(broadcast(nDocs))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(idfU).as("s"))
    val wl = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("nid").asc)
    val lrank = lex.withColumn("rl", row_number().over(wl)).where(col("rl") <= listN)
      .select(col("qid"), col("nid"), col("rl"))

    // ---- dense leg: cosine top-listN (the brute-force baseline) ----
    val vAll = embs.select(vecId.as("id"), Similarity.toDouble(vec).as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    // queries drawn from the FULL frame; only candidates are filtered
    val v = eligible.map(e => vAll.join(e.select(col("id")), Seq("id"), "left_semi"))
      .getOrElse(vAll)
    val q = vAll.where(isQuery(col("id")))
      .select(col("id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val sem = v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        Rounding.r(Similarity.cosineWithNorms(
          Similarity.dot(col("qv"), col("v")), col("qn2"), col("n2")), 4).as("c"))
    val ws = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid").asc)
    val srank = sem.withColumn("rs", row_number().over(ws)).where(col("rs") <= listN)
      .select(col("qid").as("sqid"), col("nid").as("snid"), col("rs"))

    fuse(lrank, srank, k, rrfC)
  }

  /** RRF fusion of a lexical rank list (qid, nid, rl) and a semantic
    * rank list (sqid, snid, rs): full outer on (qid, nid), an absent
    * leg contributes 0 — shared by the in-memory and the
    * persisted-index paths so the fusion arithmetic cannot drift. */
  private def fuse(lrank: DataFrame, srank: DataFrame,
                   k: Int, rrfC: Int): DataFrame = {
    val fused = lrank.join(srank,
        col("qid") === col("sqid") && col("nid") === col("snid"), "full_outer")
      .select(coalesce(col("qid"), col("sqid")).as("qid"),
        coalesce(col("nid"), col("snid")).as("nid"),
        (coalesce(lit(1.0) / (lit(rrfC) + col("rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfC) + col("rs")), lit(0.0))).as("rrf"))
    val wf = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("nid").asc)
    fused.withColumn("rank", row_number().over(wf)).where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        Rounding.r(col("rrf"), 6).as("rrf"))
  }

  /** The PRODUCTION hybrid shape — both legs served from PERSISTED
    * transactional indexes, cost ∝ queries · (posting sizes + beam
    * walk), never a corpus scan or a broadcast cosine sweep:
    *
    *  - sparse leg: [[graft.sinks.InvertedIndex.rankTx]] over the
    *    committed postings chain (idf from index-resident df, the
    *    same 1e-4 integer-unit basis as [[rrfTopk]]'s in-memory leg —
    *    identical ranks on a fresh index);
    *  - dense leg: [[graft.ops.GraphIndex.search]] beam probe of the
    *    committed graph-ANN index (approximate — recall per the gated
    *    `ann_recall_audit` floors);
    *  - fusion: the SAME [[fuse]] arithmetic as [[rrfTopk]].
    *
    * The driver gate `ann_hybrid_indexed` pins fused-top-k overlap
    * against [[rrfTopk]] on a deterministic query sample per round.
    *
    * @param queryDocs (qid, text) of the query documents
    * @param queryVecs (qid, vector) of the same queries
    * @param nDocs     corpus document count (for idf)
    */
  def rrfTopkIndexed(spark: org.apache.spark.sql.SparkSession,
                     invRoot: String, graphRoot: String,
                     queryDocs: DataFrame, qDocId: Column, qText: Column,
                     queryVecs: DataFrame, qVecId: Column, qVec: Column,
                     nDocs: Long, k: Int = 5, listN: Int = 20,
                     rrfC: Int = 60): DataFrame = {
    val lex = graft.sinks.InvertedIndex.rankTx(spark, invRoot,
      queryDocs.select(qDocId.as("qid"), qText.as("qtext")),
      col("qid"), col("qtext"), nDocs)
    val wl = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("id").asc)
    val lrank = lex.withColumn("rl", row_number().over(wl)).where(col("rl") <= listN)
      .select(col("qid"), col("id").as("nid"), col("rl"))
    val srank = GraphIndex.search(spark, graphRoot, queryVecs, qVecId, qVec,
        k = listN)
      .select(col("qid").as("sqid"), col("nid").as("snid"), col("rank").as("rs"))
    fuse(lrank, srank, k, rrfC)
  }

  /** FILTERED hybrid retrieval from the persisted indexes — the
    * filter + hybrid query a real retrieval stack actually serves
    * ("top-k by fused rank among rows satisfying a predicate"),
    * composing [[rrfTopkIndexed]]'s legs with the
    * [[graft.ops.FilteredAnn]] eligibility discipline:
    *
    *  - sparse leg: [[graft.sinks.InvertedIndex.rankTx]] candidates
    *    SEMI-JOINED to the eligible ids BEFORE ranking — posting
    *    traversal is unaffected by the filter (it's an id-set scan),
    *    so pre-filtering costs one bounded semi-join and keeps ranks
    *    exact over the eligible slice; idf stays index-resident
    *    (corpus-wide), matching [[rrfTopk]]'s `eligible` convention;
    *  - dense leg: [[GraphIndex.searchFiltered]] — full-graph routing
    *    with over-fetch + post-filter + exact fallback (pre-filtering
    *    a graph walk would disconnect it), so the leg inherits the
    *    min(k, |eligible∖{self}|) fill guarantee;
    *  - fusion: the SAME [[fuse]] arithmetic as every other path.
    *
    * Cost ∝ queries · (postings + beam) + one eligible semi-join per
    * leg — the eligible frame may be corpus-scale and is never
    * broadcast or collected. */
  def rrfTopkFilteredIndexed(spark: org.apache.spark.sql.SparkSession,
                             invRoot: String, graphRoot: String,
                             queryDocs: DataFrame, qDocId: Column, qText: Column,
                             queryVecs: DataFrame, qVecId: Column, qVec: Column,
                             nDocs: Long, eligible: DataFrame, eligibleId: Column,
                             k: Int = 5, listN: Int = 20,
                             rrfC: Int = 60): DataFrame = {
    val elig = eligible.select(eligibleId.cast("long").as("id")).distinct()
    val lex = graft.sinks.InvertedIndex.rankTx(spark, invRoot,
        queryDocs.select(qDocId.as("qid"), qText.as("qtext")),
        col("qid"), col("qtext"), nDocs)
      .join(elig, Seq("id"), "left_semi")
    val wl = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("id").asc)
    val lrank = lex.withColumn("rl", row_number().over(wl)).where(col("rl") <= listN)
      .select(col("qid"), col("id").as("nid"), col("rl"))
    val srank = GraphIndex.searchFiltered(spark, graphRoot, queryVecs,
        qVecId, qVec, k = listN, eligible, eligibleId)
      .select(col("qid").as("sqid"), col("nid").as("snid"), col("rank").as("rs"))
    fuse(lrank, srank, k, rrfC)
  }
}
