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
  * Codes are assigned by SORTED value order, so a rebuild on the same
  * value set is bit-identical and code order preserves value order —
  * which is what lets [[readTxEncodedRange]] translate value-range
  * predicates into one code interval.
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
            min(col("value")).as("v_lo"), max(col("value")).as("v_hi"))
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
          (enc.where(col(s"${column}__code").between(cLo, cHi)), Some(dict))
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
