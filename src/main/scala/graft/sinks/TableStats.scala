package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE for TxLog-backed lake tables — the StarRocks `ANALYZE
  * TABLE` / Spark CBO statistics role, kept table-format-local: one
  * aggregate-only pass over the merged table records row count,
  * on-disk bytes, and per-column (nulls, approximate NDV, min, max)
  * into a version-stamped `_stats.v<N>` sidecar at the table root.
  *
  * Why it matters at 100 TB: Spark sizes a merge-on-read table by the
  * SCAN bytes under it, and the latest-per-key aggregate above the
  * scan makes that estimate useless for join planning — a dimension
  * table folded from years of deltas plans as "unknown, assume big"
  * and falls off the broadcast path exactly where broadcasting wins
  * most. [[readTxAnalyzed]] closes the loop: it serves the merged
  * read WITH a broadcast hint when the CURRENT version's recorded
  * stats fit under the threshold, so a PK-table dimension joins like
  * the small table it actually is.
  *
  * Staleness rule: stats are only served when their recorded version
  * equals the table's current version — an un-analyzed commit simply
  * withdraws the hint (back to Spark's conservative default), it can
  * never mislead planning. NDV is approx_count_distinct (~2–5%
  * relative error, the standard HLL trade for stats); rows / nulls /
  * min / max are exact.
  */
object TableStats {

  final case class ColStat(nulls: Long, ndv: Long, min: String, max: String)
  final case class Stats(version: Long, rows: Long, bytes: Long,
                         cols: Map[String, ColStat])

  private def fileName(v: Long) = s"_stats.v$v"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One analysis pass over the table's CURRENT contents; writes the
    * version-stamped sidecar and returns the stats. Cost: one count +
    * one aggregate-only job over the merged table (a maintenance
    * action, same budget class as compaction's sizing pass). */
  def analyzeTx(spark: SparkSession, root: String): Stats = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"analyzeTx: no committed version under $root"))
    val df = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
      approx_count_distinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getAs[Long]("__rows")
    val fs = fsOf(spark, root)
    val bytes = (m.dataDir +: m.deltas).map { d =>
      fs.listStatus(new Path(d)).filter { s =>
        val n = s.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getLen).sum
    }.sum
    val colStats = cols.map { c =>
      c -> ColStat(
        if (rows == 0) 0L else r.getAs[Long](s"nulls_$c"),
        if (rows == 0) 0L else r.getAs[Long](s"ndv_$c"),
        Option(r.getAs[String](s"min_$c")).getOrElse(""),
        Option(r.getAs[String](s"max_$c")).getOrElse(""))
    }.toMap
    val stats = Stats(m.version, rows, bytes, colStats)
    write(spark, root, stats)
    stats
  }

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"; case '\t' => "\\t"; case '\n' => "\\n"
    case c => c.toString
  }
  private def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b += '\t'; case 'n' => b += '\n'; case x => b += x
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private def write(spark: SparkSession, root: String, st: Stats): Unit = {
    val lines = s"rows=${st.rows}\tbytes=${st.bytes}" +:
      st.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
        s"col=${esc(c)}\tnulls=${cs.nulls}\tndv=${cs.ndv}" +
          s"\tmin=${esc(cs.min)}\tmax=${esc(cs.max)}"
      }
    val fs = fsOf(spark, root)
    val out = fs.create(new Path(root, fileName(st.version)), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The CURRENT version's stats, or None when the table was never
    * analyzed at this version (stale sidecars are never served). */
  def statsTx(spark: SparkSession, root: String): Option[Stats] = {
    val m = TxLog.current(spark, root).getOrElse(return None)
    val p = new Path(root, fileName(m.version))
    val fs = fsOf(spark, root)
    if (!fs.exists(p)) return None
    val txt = { val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close() }
    val ls = txt.linesIterator.filter(_.nonEmpty).toSeq
    val head = ls.head.split("\t").map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    val cols = ls.tail.map { l =>
      val kv = l.split("\t").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      unesc(kv("col")) -> ColStat(kv("nulls").toLong, kv("ndv").toLong,
        unesc(kv("min")), unesc(kv("max")))
    }.toMap
    Some(Stats(m.version, head("rows").toLong, head("bytes").toLong, cols))
  }

  /** Threshold for the stats-driven broadcast hint: the session's
    * autoBroadcastJoinThreshold when positive, else 32 MB (so a
    * session that disabled size-estimate broadcasting — the common
    * defensive setting precisely BECAUSE estimates lie — still gets
    * the measured-stats hint). */
  private def thresholdBytes(spark: SparkSession): Long = {
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // "-1" (the disable sentinel) is not a parseable byte string
    val v = try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
    catch { case _: NumberFormatException => -1L }
    if (v > 0) v else 32L * 1024 * 1024
  }

  /** The merged table read, broadcast-hinted when the current
    * version's MEASURED stats fit the threshold — size-estimate-blind
    * join planning replaced by ANALYZE truth. Un-analyzed (or
    * stale-analyzed, or big) tables read identically to
    * [[PkTableSink.readTx]]. */
  def readTxAnalyzed(spark: SparkSession, root: String,
                     schemaOf: => DataFrame): DataFrame = {
    val df = PkTableSink.readTx(spark, root, schemaOf)
    statsTx(spark, root) match {
      case Some(st) if st.bytes > 0 && st.bytes <= thresholdBytes(spark) =>
        df.hint("broadcast")
      case _ => df
    }
  }
}
