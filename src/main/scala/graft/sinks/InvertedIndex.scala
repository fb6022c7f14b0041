package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Rbm

/** Full-text INVERTED INDEX for TxLog-backed lake tables — the
  * StarRocks GIN / inverted-index role (`CREATE INDEX ... USING GIN`,
  * `MATCH` predicates), re-expressed on the lake layout: one posting
  * row per token, the posting list itself a compressed [[Rbm]] bitmap
  * of row ids, persisted as a version-stamped `_invidx.v<N>` parquet
  * directory at the table root.
  *
  * Why a bitmap posting list at 100 TB: term search must never scan
  * the corpus. Here a k-term query reads k posting ROWS (token
  * equality pushed to the parquet scan), intersects them as compressed
  * bitmaps ([[Rbm.andBm]] — bytes ∝ occupied buckets, never ∝ corpus),
  * decodes only the FINAL intersection to ids, and semi-joins the base
  * table by key. Probe cost ∝ posting sizes of the query's terms +
  * matched rows; the corpus-sized work happened once, at build time,
  * as one tokenize + one (token → bitmap) aggregation.
  *
  * Staleness rule (same contract as [[TableStats]]): the index is
  * served only when its stamped version equals the table's CURRENT
  * version. A commit without a rebuild silently withdraws the index —
  * [[searchTx]] falls back to the exact full-scan predicate, so
  * results are always correct and the index can only ever accelerate.
  *
  * Id domain: the indexed id column must be a non-negative long (the
  * bitmap's domain — same constraint as every Rbm use).
  */
object InvertedIndex {

  private def dirName(v: Long) = s"_invidx.v$v"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The analyzer: lowercase, split on non-letter/digit runs, drop
    * empties. Build and search MUST share this (the search fallback
    * applies it to the raw column, so index and scan agree). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Build (or rebuild) the index for the table's CURRENT version:
    * one pass — tokenize, per-doc distinct, (token → Rbm bitmap, df)
    * aggregation — written atomically for version N. Returns N. */
  def buildTx(spark: SparkSession, root: String, idCol: String,
              textCol: String): Long = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"buildTx: no committed version under $root"))
    val df = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(Rbm.rbmOf(col("id")).as("postings"), count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$root/${dirName(m.version)}")
    m.version
  }

  /** True iff a fresh (current-version) index exists. */
  def isCurrent(spark: SparkSession, root: String): Boolean =
    TxLog.current(spark, root).exists(m =>
      fsOf(spark, root).exists(new Path(root, dirName(m.version))))

  /** Rows whose text contains ALL (`requireAll=true`, the `MATCH_ALL`
    * shape) or ANY (`MATCH_ANY`) of `terms`. Fresh index → posting
    * probe + semi-join; stale/absent index → exact full-scan fallback
    * with the same analyzer. Terms are analyzer-normalized first, so
    * `search(.., Seq("Spark!"))` matches the token `spark`. */
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
    val idxPath = new Path(root, dirName(m.version))
    if (!fsOf(spark, root).exists(idxPath)) {
      // withdrawn index: exact predicate over the merged read — the
      // conservative twin of the zone-map/Bloom fallback readers
      val hits = norm.map(t => array_contains(tokens(col(textCol)), t))
      return base.where(if (requireAll) hits.reduce(_ && _) else hits.reduce(_ || _))
    }
    val posts = spark.read.parquet(idxPath.toString)
    val ids: DataFrame =
      if (requireAll) {
        // fold ∩ over ≤1-row frames, SMALLEST posting first so the
        // intersection shrinks immediately; a missing term short-
        // circuits to empty via the 0-row cross join. k tiny scans,
        // each a token-equality pushed parquet read.
        val dfs = norm.map(t => t -> posts.where(col("token") === t)
          .select(col("postings"), col("df")))
        val ordered = dfs.map { case (t, d) =>
          (t, d, d.select(col("df")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
            .collect().headOption.getOrElse(-1L))
        }.sortBy(_._3)
        if (ordered.head._3 < 0) return base.limit(0) // a term matches nothing
        val folded = ordered.map(_._2.select(col("postings")))
          .reduce((a, b) => a.crossJoin(b.withColumnRenamed("postings", "p2"))
            .select(Rbm.andBm(col("postings"), col("p2")).as("postings")))
        folded.select(explode(Rbm.toIds(col("postings"))).as("__id"))
      } else {
        posts.where(col("token").isin(norm: _*))
          .select(explode(Rbm.toIds(col("postings"))).as("__id"))
          .distinct()
      }
    base.join(ids, base(idCol).cast("long") === ids("__id"), "left_semi")
  }

  /** Probe accounting for a spec/bench: (index served?, rows the
    * probe would return). */
  def searchStatsTx(spark: SparkSession, root: String, schemaOf: => DataFrame,
                    idCol: String, textCol: String, terms: Seq[String],
                    requireAll: Boolean = true): (Boolean, Long) = {
    val used = isCurrent(spark, root)
    val n = searchTx(spark, root, schemaOf, idCol, textCol, terms, requireAll).count()
    (used, n)
  }
}
