package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global low-cardinality STRING DICTIONARY for TxLog-backed lake
  * tables — the StarRocks "low cardinality global dict" optimization
  * (string group-by/filter columns rewritten to int codes at scan,
  * decoded after the aggregate), kept explicit on the lake layout: a
  * version-stamped `_dict.<col>.v<N>` parquet mapping value → dense
  * int code, built from one distinct pass over the current version.
  *
  * Why it matters at 100 TB: a group-by/shuffle on a long string
  * column hashes and ships the string bytes per row; with a dict the
  * row-scale path carries a 4-byte code (the encode join is a
  * broadcast against a dictionary whose size is the column's NDV —
  * low-cardinality by contract), and the string reappears only after
  * aggregation, on group-cardinality rows. Same dense-code trick the
  * engine's columnar formats use per file, made GLOBAL so codes agree
  * across files and shuffles.
  *
  * Staleness rule (the [[TableStats]] contract): a commit can
  * introduce values the dict has never seen, so the dict is served
  * only when its stamped version equals the table's current version —
  * [[readTxEncoded]] falls back to the un-encoded read otherwise.
  * [[refreshTx]] restores freshness at delta cost (append-only code
  * extension) instead of [[buildTx]]'s full distinct pass.
  * [[buildTx]] assigns codes by SORTED value order, so a rebuild on
  * the same value set is bit-identical and code order preserves value
  * order — which is what lets [[readTxEncodedRange]] translate
  * value-range predicates into one code interval; a refresh-appended
  * dict loses global order, and the range path's interval-density
  * check detects that per query and falls back to pure value-domain
  * pruning (exact either way).
  */
object GlobalDict {

  private def dirName(column: String, v: Long) = s"_dict.$column.v$v"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build the dictionary for `column` at the table's CURRENT version:
    * one distinct + rank pass; null is not a dict entry (encoded rows
    * keep null). Returns the stamped version. */
  def buildTx(spark: SparkSession, root: String, column: String): Long = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"buildTx: no committed version under $root"))
    val df = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    // dense ranks avoid a 1-partition row_number window: sort a frame
    // of NDV rows (small by contract), zip with index
    val distinctVals = df.select(col(column).cast("string").as("value"))
      .where(col("value").isNotNull).distinct()
      .orderBy(col("value"))
    val spark2 = df.sparkSession
    import spark2.implicits._
    val dict = distinctVals.as[String].rdd.zipWithIndex()
      .map { case (v, i) => (v, i.toInt) }.toDF("value", "code")
    dict.write.mode("overwrite").parquet(s"$root/${dirName(column, m.version)}")
    m.version
  }

  /** The CURRENT version's dictionary, or None when the table moved
    * since the last build (never serve codes that might miss values). */
  def dictTx(spark: SparkSession, root: String, column: String): Option[DataFrame] = {
    val m = TxLog.current(spark, root).getOrElse(return None)
    val p = new Path(root, dirName(column, m.version))
    if (!fsOf(spark, root).exists(p)) return None
    Some(spark.read.parquet(p.toString))
  }

  /** The newest dict generation at or below the current version —
    * [[refreshTx]]'s base. Never served (serving is pinned to the
    * exact-current-version rule in [[dictTx]]). */
  private def latestDictVersion(spark: SparkSession, root: String,
                                column: String, cur: Long): Option[Long] = {
    val fs = fsOf(spark, root)
    fs.listStatus(new Path(root)).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith(s"_dict.$column.v") =>
        n.stripPrefix(s"_dict.$column.v") }
      .flatMap(_.toLongOption).filter(_ <= cur)
      .sorted(Ordering[Long].reverse).headOption
  }

  /** INCREMENTAL dict refresh, cost ∝ the change feed since the last
    * generation (the [[InvertedIndex.updateTx]] discipline for the
    * dict — at 100 TB a commit must not force a full-table distinct
    * pass to restore the encoded path): values ADDED by the delta that
    * the base dict lacks get codes appended after the current max, in
    * sorted order among themselves; a delta adding nothing re-stamps
    * the base dict verbatim (bit-identical, order-preserving codes
    * intact). Values that disappeared stay in the dict — a superset
    * dict encodes correctly, it only wastes codes (a periodic
    * [[buildTx]] compacts).
    *
    * Appended codes are NOT globally order-preserving;
    * [[readTxEncodedRange]] detects this per query (the interval-
    * density check) and keeps the value-domain pruning while skipping
    * only the code-interval shortcut, so correctness never depends on
    * sortedness. Returns the stamped version, or None when the new
    * value count would push the dict past `maxCardinality` — the
    * low-cardinality contract is genuinely broken, the dict WITHDRAWS
    * (stays stale) rather than ship a dictionary big enough to hurt
    * the broadcasts it exists to feed. Falls back to a full
    * [[buildTx]] when no prior generation survives. */
  def refreshTx(spark: SparkSession, root: String, column: String,
                maxCardinality: Long = 1L << 22): Option[Long] = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"refreshTx: no committed version under $root"))
    latestDictVersion(spark, root, column, m.version) match {
      case None => Some(buildTx(spark, root, column))
      case Some(v0) if v0 == m.version => Some(v0)
      case Some(v0) =>
        val old = spark.read.parquet(s"$root/${dirName(column, v0)}")
        val feed = PkTableSink.readTxChanges(spark, root, v0, m.version)
        val fresh = feed.where(col("_change_type") =!= "delete")
          .select(col(column).cast("string").as("value"))
          .where(col("value").isNotNull).distinct()
          .join(old.select(col("value")), Seq("value"), "left_anti")
          .orderBy(col("value"))
        val spark2 = old.sparkSession
        import spark2.implicits._
        val oldSize = old.count()
        val newCount = fresh.count()
        // cardinality gate BEFORE the driver collect: a contract-
        // breaking delta (a high-NDV column mistakenly dict-encoded)
        // must not OOM the driver on its way to being refused
        if (oldSize + newCount > maxCardinality) None
        else {
          val newVals = fresh.as[String].collect()
          val dict =
            if (newVals.isEmpty) old
            else {
              // max over ZERO rows is null — buildTx on an all-null
              // column legitimately commits an empty dict, and a later
              // delta must start coding from 0, not NPE
              val maxRow = old.agg(max(col("code"))).head()
              val maxCode = if (maxRow.isNullAt(0)) -1 else maxRow.getInt(0)
              old.unionByName(newVals.zipWithIndex
                .map { case (v, i) => (v, maxCode + 1 + i) }.toSeq
                .toDF("value", "code"))
            }
          // localCheckpoint-free double-read is fine: both sides are
          // dictionary-sized. Write via temp+rename-less overwrite is
          // safe — the new stamped dir is never read until it exists
          // (dictTx checks existence) and a partial write fails the
          // exists+read, not correctness.
          dict.write.mode("overwrite")
            .parquet(s"$root/${dirName(column, m.version)}")
          Some(m.version)
        }
    }
  }

  /** Merged read with `column` replaced by its int code in
    * `<column>__code` (fresh dict: every non-null value has a code by
    * construction). Returns (frame, Some(dict)) on the encoded path or
    * (plain readTx, None) when the dict is stale/absent — callers
    * branch on the option, so a stale dict can only ever cost the
    * optimization, never correctness. */
  def readTxEncoded(spark: SparkSession, root: String, schemaOf: => DataFrame,
                    column: String): (DataFrame, Option[DataFrame]) =
    dictTx(spark, root, column) match {
      case Some(dict) =>
        val base = PkTableSink.readTx(spark, root, schemaOf)
        val d = broadcast(dict)
          .withColumnRenamed("value", "__dict_value")
          .withColumnRenamed("code", s"${column}__code")
        val enc = base.join(d, base(column).cast("string") === d("__dict_value"), "left")
          .drop("__dict_value").drop(column)
        (enc, Some(dict))
      case None =>
        (PkTableSink.readTx(spark, root, schemaOf), None)
    }

  /** RANGE-FILTER TRANSLATION — the promise the sorted-order code
    * assignment exists to keep: `column BETWEEN lower AND upper`
    * translated through the dictionary BEFORE the scan plans.
    *
    * Codes are order-preserving, so the value range maps to one code
    * interval [cLo, cHi] — resolved with one filter+agg over the
    * NDV-sized dict (driver-side, 4 scalars). Two artifacts come back:
    *
    *  - the interval's VALUE-domain image [vLo, vHi] (bounds SNAPPED to
    *    actual dictionary values — usually tighter than the caller's
    *    literals) is applied to the base read, where it reaches the
    *    parquet scan as PushedFilters: the data files store strings,
    *    so the snapped string range is exactly what the scan can
    *    prune with (codes live only post-encode — pushing an int
    *    predicate at file level would require physically re-encoded
    *    files);
    *  - the CODE interval is applied on the encoded row path
    *    (`<column>__code BETWEEN cLo AND cHi`, a 4-byte integer
    *    compare), so every downstream operator — and any further
    *    predicate a caller composes in the code domain — works on
    *    codes, never strings.
    *
    * An empty intersection (no dict value inside the range) returns
    * the encoded frame filtered to zero rows without scanning. A
    * stale/absent dict degrades to (plain readTx + raw range filter,
    * None) — the [[readTxEncoded]] staleness contract: correctness
    * never depends on the dict, only the optimization does.
    */
  def readTxEncodedRange(spark: SparkSession, root: String, schemaOf: => DataFrame,
                         column: String, lower: String, upper: String)
      : (DataFrame, Option[DataFrame]) = {
    require(lower <= upper, s"empty range: '$lower' > '$upper'")
    dictTx(spark, root, column) match {
      case None =>
        val raw = PkTableSink.readTx(spark, root, schemaOf)
        (raw.where(col(column) >= lower && col(column) <= upper), None)
      case Some(dict) =>
        val hit = dict.where(col("value") >= lower && col("value") <= upper)
          .agg(min(col("code")).as("c_lo"), max(col("code")).as("c_hi"),
            min(col("value")).as("v_lo"), max(col("value")).as("v_hi"),
            count(col("code")).as("n_codes"))
          .head()
        val base = PkTableSink.readTx(spark, root, schemaOf)
        val d = broadcast(dict)
          .withColumnRenamed("value", "__dict_value")
          .withColumnRenamed("code", s"${column}__code")
        if (hit.isNullAt(0)) {
          // no dictionary value inside the range ⇒ no row can match
          val enc = base.join(d, base(column).cast("string") === d("__dict_value"), "left")
            .drop("__dict_value").drop(column)
          (enc.where(lit(false)), Some(dict))
        } else {
          val (cLo, cHi) = (hit.getInt(0), hit.getInt(1))
          val (vLo, vHi) = (hit.getString(2), hit.getString(3))
          val pruned = base.where(col(column) >= vLo && col(column) <= vHi)
          val enc = pruned.join(d, pruned(column).cast("string") === d("__dict_value"), "left")
            .drop("__dict_value").drop(column)
          // INTERVAL-DENSITY check: k matching codes spanning an
          // interval of exactly width k ⇒ the interval contains no
          // foreign code, so the code-domain shortcut is sound. A
          // refreshTx-appended dict can fail this (its codes are not
          // globally order-preserving); the value-domain pruning above
          // is already exact then — a dict covering every stored value
          // means rows in [vLo,vHi] are precisely the range's matches —
          // so only the code-interval SHORTCUT is skipped, never rows.
          val contiguous = hit.getLong(4) == (cHi.toLong - cLo.toLong + 1L)
          val out = if (contiguous)
            enc.where(col(s"${column}__code").between(cLo, cHi))
          else enc
          (out, Some(dict))
        }
    }
  }

  /** Late decode: translate `codeCol` back to the string value as
    * `outCol` via a broadcast of the (NDV-sized) dict — run AFTER the
    * aggregate, on group-cardinality rows. */
  def decode(df: DataFrame, dict: DataFrame, codeCol: String, outCol: String): DataFrame = {
    val d = broadcast(dict)
      .withColumnRenamed("code", "__dict_code")
      .withColumnRenamed("value", outCol)
    df.join(d, df(codeCol) === d("__dict_code"), "left").drop("__dict_code")
  }
}
