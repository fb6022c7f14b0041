package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rbm

/** Full-text INVERTED INDEX for TxLog-backed lake tables — the
  * StarRocks GIN / inverted-index role (`CREATE INDEX ... USING GIN`,
  * `MATCH` predicates), re-expressed on the lake layout: one posting
  * row per token, the posting list itself a compressed [[Rbm]] bitmap
  * of row ids, persisted as version-stamped parquet at the table root.
  *
  * Why a bitmap posting list at 100 TB: term search must never scan
  * the corpus. Here a k-term query reads k posting rows per chain dir
  * (token equality pushed to the parquet scan), union-merges each
  * term's chain entries as compressed bitmaps ([[Rbm.rbmUnion]]),
  * intersects terms with [[Rbm.andBm]] (bytes ∝ occupied buckets,
  * never ∝ corpus), decodes only the FINAL candidate set to ids, and
  * semi-joins the base table by key. Probe cost ∝ posting sizes of
  * the query's terms + matched rows; the corpus-sized work happened
  * at build time, one tokenize + one (token → bitmap) aggregation.
  *
  * INCREMENTAL maintenance (the hot-table path, same spirit as the
  * per-delta pruning sidecars): the index is a CHAIN — a full build
  * `_invidx.v<K>` plus delta dirs `_invidx.d<from>_<to>`, each built
  * from the version change feed (inserted/updated rows only, cost ∝
  * the delta). Chain postings are a SUPERSET of the truth (an updated
  * or deleted row's old tokens still point at it), so every search
  * re-verifies candidates with the exact analyzer predicate on the
  * FETCHED rows — sound (the chain covers every live row's current
  * tokens: full build at K, every later insert/update in some delta)
  * and cheap (the re-check touches matched rows, not the corpus).
  *
  * Freshness rule: the chain must reach the table's CURRENT version
  * exactly; a commit without [[updateTx]] breaks the chain and
  * [[searchTx]] falls back to the exact full-scan predicate — results
  * are always correct, the index can only ever accelerate.
  */
object InvertedIndex {

  private def baseDirName(v: Long) = s"_invidx.v$v"
  private def deltaDirName(from: Long, to: Long) = s"_invidx.d${from}_$to"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The analyzer: lowercase, split on non-letter/digit runs, drop
    * empties. Build and search MUST share this (the verify/fallback
    * predicate applies it to the raw column). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  private def postingsOf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(Rbm.rbmOf(col("id")).as("postings"), count(lit(1)).as("df"))

  /** Full build (or rebuild) at the table's CURRENT version: one pass
    * over the merged table. Returns the stamped version. */
  def buildTx(spark: SparkSession, root: String, idCol: String,
              textCol: String): Long = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"buildTx: no committed version under $root"))
    postingsOf(PkTableSink.readTx(spark, root, spark.emptyDataFrame), idCol, textCol)
      .write.mode("overwrite").parquet(s"$root/${baseDirName(m.version)}")
    m.version
  }

  /** Extend the chain to the CURRENT version from the version change
    * feed — cost ∝ rows changed since the chain's end, not the table.
    * No chain at all → full [[buildTx]]. Returns the covered version. */
  def updateTx(spark: SparkSession, root: String, idCol: String,
               textCol: String): Long = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"updateTx: no committed version under $root"))
    chain(spark, root, m.version) match {
      case None => buildTx(spark, root, idCol, textCol)
      case Some((end, _)) if end == m.version => m.version
      case Some((end, _)) =>
        val changed = PkTableSink.readTxChanges(spark, root, end, m.version)
          .where(col("_change_type").isin("insert", "update"))
          .drop("_change_type")
        postingsOf(changed, idCol, textCol)
          .write.mode("overwrite").parquet(s"$root/${deltaDirName(end, m.version)}")
        m.version
    }
  }

  /** The longest chain starting at the newest full build with base
    * version ≤ `current`: (covered-end-version, dirs). */
  private def chain(spark: SparkSession, root: String,
                    current: Long): Option[(Long, Seq[String])] = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return None
    val names = fs.listStatus(rootPath).map(_.getPath.getName)
      .filter(_.startsWith("_invidx.")).toSeq
    val bases = names.collect { case n if n.startsWith("_invidx.v") =>
      n.stripPrefix("_invidx.v").toLong
    }.filter(_ <= current)
    if (bases.isEmpty) return None
    val deltas = names.collect { case n if n.startsWith("_invidx.d") =>
      val Array(f, t) = n.stripPrefix("_invidx.d").split("_")
      (f.toLong, t.toLong)
    }.groupBy(_._1).map { case (f, ts) => f -> ts.map(_._2).max } // farthest hop per from
    val base = bases.max
    var end = base
    var dirs = Seq(s"$root/${baseDirName(base)}")
    while (end < current && deltas.contains(end) && deltas(end) <= current) {
      val to = deltas(end)
      dirs = dirs :+ s"$root/${deltaDirName(end, to)}"
      end = to
    }
    Some((end, dirs))
  }

  /** True iff the chain reaches the current table version. */
  def isCurrent(spark: SparkSession, root: String): Boolean =
    TxLog.current(spark, root).exists(m =>
      chain(spark, root, m.version).exists(_._1 == m.version))

  /** Rows whose text contains ALL (`requireAll=true`, the `MATCH_ALL`
    * shape) or ANY (`MATCH_ANY`) of `terms`. Fresh chain → posting
    * probe + semi-join + exact re-verify; broken chain → exact
    * full-scan fallback. Terms are analyzer-normalized first. */
  def searchTx(spark: SparkSession, root: String, schemaOf: => DataFrame,
               idCol: String, textCol: String, terms: Seq[String],
               requireAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "searchTx needs at least one term")
    val norm = terms.map(_.toLowerCase)
      .flatMap(_.split("[^\\p{L}\\p{N}]+")).filter(_.nonEmpty).distinct
    require(norm.nonEmpty, s"no indexable token in $terms")
    val base = PkTableSink.readTx(spark, root, schemaOf)
    val m = TxLog.current(spark, root).getOrElse(
      throw new IllegalStateException(s"searchTx: no committed version under $root"))
    val hits = norm.map(t => array_contains(tokens(col(textCol)), t))
    val exactPred = if (requireAll) hits.reduce(_ && _) else hits.reduce(_ || _)
    chain(spark, root, m.version) match {
      case Some((end, dirs)) if end == m.version =>
        val posts = spark.read.parquet(dirs: _*)
        val ids: DataFrame =
          if (requireAll) {
            // per term: union the chain's entries into ONE bitmap
            // (≤ |dirs| rows), then fold ∩ smallest-posting-first so
            // the intersection shrinks immediately; a term with no
            // postings anywhere short-circuits via the 0-row cross
            // join. k tiny token-equality-pushed scans.
            val perTerm = norm.map { t =>
              val one = posts.where(col("token") === t)
                .agg(Rbm.rbmUnion(col("postings")).as("postings"),
                  sum(col("df")).as("df"))
                .where(col("df").isNotNull) // 0 input rows → drop
              val df = one.select(col("df"))
                .as[Long](org.apache.spark.sql.Encoders.scalaLong)
                .collect().headOption.getOrElse(-1L)
              (one.select(col("postings")), df)
            }.sortBy(_._2)
            if (perTerm.head._2 < 0) return base.limit(0)
            perTerm.map(_._1)
              .reduce((a, b) => a.crossJoin(b.withColumnRenamed("postings", "p2"))
                .select(Rbm.andBm(col("postings"), col("p2")).as("postings")))
              .select(explode(Rbm.toIds(col("postings"))).as("__id"))
          } else {
            posts.where(col("token").isin(norm: _*))
              .select(explode(Rbm.toIds(col("postings"))).as("__id"))
              .distinct()
          }
        // chain postings can be stale for updated/deleted rows — the
        // exact predicate re-verifies the FETCHED candidates only
        base.join(ids, base(idCol).cast("long") === ids("__id"), "left_semi")
          .where(exactPred)
      case _ =>
        base.where(exactPred)
    }
  }

  /** PHRASE search (the StarRocks `MATCH` phrase shape): rows whose
    * ANALYZED token stream contains `phrase`'s tokens consecutively
    * and in order. The index stores positionless bitmap postings, so
    * the phrase plans as its MATCH_ALL term set through the posting
    * probe (phrase ⊆ all-terms-present: candidates are a superset)
    * and the adjacency check runs as a row-local predicate on the
    * FETCHED candidates only — the classic positionless-index
    * post-verify, cost ∝ matched-candidate rows, never the corpus.
    * A broken chain inherits [[searchTx]]'s exact full-scan fallback,
    * with the same phrase predicate applied — correct either way.
    */
  def phraseTx(spark: SparkSession, root: String, schemaOf: => DataFrame,
               idCol: String, textCol: String, phrase: String): DataFrame = {
    // analyzer-normalize KEEPING order and duplicates — "the the end"
    // must match exactly that token run
    val terms = phrase.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, s"no indexable token in phrase '$phrase'")
    val p = terms.length
    val toks = tokens(col(textCol))
    // adjacency: some start i in [1, n-p+1] has toks[i+j-1] == term_j
    // ∀j. Guarded: sequence(1, n-p+1) would run DESCENDING for n < p.
    val phrasePred =
      when(size(toks) >= p,
        exists(sequence(lit(1), size(toks) - (p - 1)), i =>
          terms.zipWithIndex.map { case (t, j) =>
            element_at(toks, i + j) === lit(t)
          }.reduce(_ && _)))
        .otherwise(lit(false))
    searchTx(spark, root, schemaOf, idCol, textCol, terms, requireAll = true)
      .where(phrasePred)
  }

  /** IDF-RANKED lexical candidates from the COMMITTED postings chain —
    * the serving half of a hybrid retrieval stack
    * ([[graft.ops.HybridRetrieval]] fuses this with a graph-ANN
    * probe): for a BOUNDED query frame `(qid, text)`, each shared
    * token's idf comes from INDEX-RESIDENT document frequency (the
    * chain-union posting bitmap's cardinality — standard IR practice:
    * ranking reads index stats, never the corpus) pre-rounded to 1e-4
    * integer units, and each (query, candidate) score is the Σ of
    * shared-token units — order-free long addition, the same exact
    * basis as HybridRetrieval's in-memory sparse leg, so on a fresh
    * index over the same corpus the two produce identical ranks AMONG
    * POSITIVE-SCORE candidates. (Not bit-identical candidate SETS:
    * this path prunes zero-idf-unit tokens before the posting explode,
    * so a candidate reachable ONLY through near-stopword tokens —
    * score exactly 0 — is absent here while the in-memory leg keeps
    * it at score 0. A zero-score row carries no ranking signal either
    * way; top-k consumers that might pad with zero-score rows should
    * treat the two sets as equal only on the positive-score prefix.)
    *
    * Cost ∝ query tokens × matched posting sizes (the query-token set
    * is broadcast; only its postings are read — token equality pushed
    * to the parquet scan). Self-pairs (id == qid) are excluded.
    * Requires a FRESH chain: ranking cannot re-verify staleness the
    * way [[searchTx]] does (a stale posting would misrank silently),
    * so a broken/behind chain throws — run [[updateTx]] first.
    *
    * @param nDocs corpus document count for the idf denominator (the
    *              caller's table stat; not derivable from postings)
    * @return (qid, id, s) for every candidate sharing ≥1 token
    */
  def rankTx(spark: SparkSession, root: String, queryDocs: DataFrame,
             qid: Column, qtext: Column, nDocs: Long): DataFrame = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"rankTx: no committed version under $root"))
    val dirs = chain(spark, root, m.version) match {
      case Some((end, ds)) if end == m.version => ds
      case _ => throw new IllegalStateException(
        s"rankTx: postings chain stale or absent under $root — updateTx first")
    }
    val posts = spark.read.parquet(dirs: _*)
    val qt = queryDocs.select(qid.cast("long").as("qid"),
      explode(array_distinct(tokens(qtext))).as("token"))
    // the query-token set is bounded by contract — collect it and
    // PUSH the token filter into the parquet scan (`isin` reaches
    // PushedFilters; a broadcast semi-join would stream every
    // posting row through the join instead). Past the cap, fall back
    // to the semi-join rather than ship a megabyte filter.
    val qTokens = qt.select(col("token")).distinct()
      .limit(20001).collect().map(_.getString(0))
    val narrowed =
      if (qTokens.length <= 20000) posts.where(col("token").isin(qTokens.toSeq: _*))
      else posts.join(broadcast(qt.select(col("token")).distinct()),
        Seq("token"), "left_semi")
    val matched = narrowed
      .groupBy(col("token"))
      .agg(Rbm.rbmUnion(col("postings")).as("postings"))
      .withColumn("dft", Rbm.cardinality(col("postings")).cast("double"))
    // per-token idf in 1e-4 integer units (HybridRetrieval's basis)
    val iu = floor(log(lit(1.0) +
      (lit(nDocs.toDouble) - col("dft") + lit(0.5)) / (col("dft") + lit(0.5))) *
      lit(1e4) + lit(0.5)).cast("long")
    val perTok = matched.withColumn("iu", iu)
      // zero-unit tokens (dft ≈ nDocs — stopwords at corpus scale)
      // cannot move any score; pruning them BEFORE the posting
      // explode is what keeps rank cost ∝ informative postings
      // instead of ∝ the "the"-posting (which is the corpus). Only
      // zero-signal tail candidates (reachable through no positive
      // token) can drop from the candidate set.
      .where(col("iu") > lit(0))
      .select(col("token"), col("iu"),
        explode(Rbm.toIds(col("postings"))).as("id"))
    qt.join(perTok, "token")
      .where(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("iu")).as("s"))
  }

  /** Probe accounting for a spec/bench: (chain served?, rows). */
  def searchStatsTx(spark: SparkSession, root: String, schemaOf: => DataFrame,
                    idCol: String, textCol: String, terms: Seq[String],
                    requireAll: Boolean = true): (Boolean, Long) = {
    val used = isCurrent(spark, root)
    val n = searchTx(spark, root, schemaOf, idCol, textCol, terms, requireAll).count()
    (used, n)
  }
}
