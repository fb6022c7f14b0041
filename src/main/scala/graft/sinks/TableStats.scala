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

  /** `hll` is the column's base64 HLL sketch (DataSketches, via
    * `hll_sketch_agg` over the string-cast values) — stored so a later
    * [[refreshTx]] can extend NDV by sketch UNION instead of
    * re-scanning; `ndv` is its estimate. "" = legacy sidecar without a
    * sketch (refresh falls back to a full analyze). */
  final case class ColStat(nulls: Long, ndv: Long, min: String, max: String,
                           hll: String = "")
  final case class Stats(version: Long, rows: Long, bytes: Long,
                         cols: Map[String, ColStat])

  private def fileName(v: Long) = s"_stats.v$v"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // NDV sketches run over the STRING CAST of the column:
  // hll_sketch_agg accepts int/long/string/binary only, and the cast
  // is distinctness-preserving for every exported type (Spark's
  // double/timestamp renderings round-trip), so the estimate matches
  // a native count while staying UNION-MERGEABLE across refreshes.
  private def sketchOf(c: String): org.apache.spark.sql.Column =
    hll_sketch_agg(col(c).cast("string"))

  private def b64(bytes: Array[Byte]): String =
    if (bytes == null) "" else java.util.Base64.getEncoder.encodeToString(bytes)

  private def onDiskBytes(spark: SparkSession, m: TxLog.Manifest): Long = {
    val fs = fsOf(spark, m.dataDir)
    (m.dataDir +: m.deltas).map { d =>
      fs.listStatus(new Path(d)).filter { s =>
        val n = s.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getLen).sum
    }.sum
  }

  /** One analysis pass over the table's CURRENT contents; writes the
    * version-stamped sidecar and returns the stats. Cost: one count +
    * one aggregate-only job over the merged table (a maintenance
    * action, same budget class as compaction's sizing pass). For a
    * refresh ∝ delta instead, see [[refreshTx]]. */
  def analyzeTx(spark: SparkSession, root: String): Stats = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"analyzeTx: no committed version under $root"))
    val df = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
      sketchOf(c).as(s"hll_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getAs[Long]("__rows")
    val bytes = onDiskBytes(spark, m)
    val sketches = cols.map(c =>
      c -> (if (rows == 0) null else r.getAs[Array[Byte]](s"hll_$c")))
    val ests = estimates(spark, sketches.map(_._2))
    val colStats = cols.zipWithIndex.map { case (c, i) =>
      c -> ColStat(
        if (rows == 0) 0L else r.getAs[Long](s"nulls_$c"),
        ests(i),
        Option(r.getAs[String](s"min_$c")).getOrElse(""),
        Option(r.getAs[String](s"max_$c")).getOrElse(""),
        b64(sketches(i)._2))
    }.toMap
    val stats = Stats(m.version, rows, bytes, colStats)
    write(spark, root, stats)
    stats
  }

  /** NDV estimates for a batch of (possibly null) sketch blobs in one
    * tiny driver-local job. */
  private def estimates(spark: SparkSession, sketches: Seq[Array[Byte]]): Seq[Long] = {
    val exprs = sketches.zipWithIndex.map { case (s, i) =>
      (if (s == null) lit(0L) else hll_sketch_estimate(lit(s))).as(s"e$i")
    }
    if (exprs.isEmpty) Nil
    else {
      val r = spark.range(1).select(exprs: _*).head()
      sketches.indices.map(i => r.getLong(i))
    }
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
          s"\tmin=${esc(cs.min)}\tmax=${esc(cs.max)}\thll=${cs.hll}"
      }
    val fs = fsOf(spark, root)
    val out = fs.create(new Path(root, fileName(st.version)), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def parse(txt: String, version: Long): Stats = {
    val ls = txt.linesIterator.filter(_.nonEmpty).toSeq
    val head = ls.head.split("\t").map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    val cols = ls.tail.map { l =>
      val kv = l.split("\t").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      unesc(kv("col")) -> ColStat(kv("nulls").toLong, kv("ndv").toLong,
        unesc(kv("min")), unesc(kv("max")), kv.getOrElse("hll", ""))
    }.toMap
    Stats(version, head("rows").toLong, head("bytes").toLong, cols)
  }

  private def read(spark: SparkSession, root: String, version: Long): Option[Stats] = {
    val p = new Path(root, fileName(version))
    val fs = fsOf(spark, root)
    if (!fs.exists(p)) return None
    val txt = { val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close() }
    Some(parse(txt, version))
  }

  /** The CURRENT version's stats, or None when the table was never
    * analyzed at this version (stale sidecars are never served). */
  def statsTx(spark: SparkSession, root: String): Option[Stats] = {
    val m = TxLog.current(spark, root).getOrElse(return None)
    read(spark, root, m.version)
  }

  /** The NEWEST stats generation at or below the current version —
    * [[refreshTx]]'s base (never SERVED: serving stays pinned to the
    * exact-current-version rule). */
  private def latestStats(spark: SparkSession, root: String,
                          currentVersion: Long): Option[Stats] = {
    val fs = fsOf(spark, root)
    val vs = fs.listStatus(new Path(root)).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("_stats.v") =>
        n.stripPrefix("_stats.v") }
      .flatMap(_.toLongOption)
      .filter(_ <= currentVersion)
    vs.sorted(Ordering[Long].reverse).iterator
      .flatMap(read(spark, root, _)).nextOption()
  }

  /** INCREMENTAL re-analyze, cost ∝ the change feed since the last
    * stats generation (the [[InvertedIndex.updateTx]] discipline
    * brought to ANALYZE — at 100 TB a commit must not force a
    * full-table re-scan to restore the measured-broadcast path):
    *
    *  - rows / per-column null counts: EXACT, by signed arithmetic
    *    over [[PkTableSink.readTxChangesCdf]] (preimages and deletes
    *    subtract, postimages and inserts add);
    *  - NDV: the stored HLL sketch UNIONED with the added images'
    *    sketch — identical to a rebuild for insert-only deltas (HLL
    *    union is register-max, so sketch(A)∪sketch(B) ≡ sketch(A∪B));
    *    after deletes it is an upper bound (distinct-count sketches
    *    cannot subtract), which can only make the broadcast hint more
    *    conservative, never wrong;
    *  - min/max: extended by the added images' native min/max; when a
    *    REMOVED image touches the recorded extremum the bound may have
    *    shrunk, so exactly those columns re-scan min/max in ONE
    *    column-pruned aggregate (ReadSchema = the affected columns);
    *  - bytes: re-listed from the manifest (metadata-only, exact).
    *
    * Falls back to [[analyzeTx]] when no prior generation survives
    * (vacuumed / never analyzed), the prior sidecar is pre-sketch
    * (legacy), or the schema widened (new columns have no base line).
    * Already-fresh stats return as-is. Writes the new generation and
    * returns it. */
  def refreshTx(spark: SparkSession, root: String): Stats = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"refreshTx: no committed version under $root"))
    val prev = latestStats(spark, root, m.version)
    prev match {
      case None => analyzeTx(spark, root)
      case Some(p) if p.version == m.version => p
      case Some(p) if p.rows > 0 && p.cols.values.exists(_.hll.isEmpty) =>
        analyzeTx(spark, root) // legacy sidecar: no sketches to union
      case Some(p) =>
        val feed = PkTableSink.readTxChangesCdf(spark, root, p.version, m.version)
        val cols = feed.columns.toSeq.filterNot(_ == "_change_type")
        if (!cols.forall(p.cols.contains))
          return analyzeTx(spark, root) // widened: new cols have no base
        val schema = feed.schema
        // non-atomic columns (array/map/struct) store min/max as cast
        // strings, and the reverse string->array cast the delta path
        // needs below is unsupported — fall back to the full analyze
        // (same degradation rule as the legacy pre-sketch sidecars),
        // so Doctor.repair never crashes on an array-bearing table
        val nonAtomic = cols.exists(c => schema(c).dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType |
               _: org.apache.spark.sql.types.StructType => true
          case _ => false
        })
        if (nonAtomic) return analyzeTx(spark, root)
        val isAdd = col("_change_type").isin("insert", "update_postimage")
        val aggs = count(lit(1)).as("__n") +:
          sum(when(isAdd, 1L).otherwise(-1L)).as("__drows") +:
          cols.flatMap { c =>
            val dt = schema(c).dataType
            val prevC = p.cols(c)
            val hadValues = prevC.nulls < p.rows
            // a removed image equal to the recorded extremum may have
            // been its last carrier — flag the column for re-scan
            val remHits =
              if (!hadValues) lit(0L)
              else max(when(!isAdd &&
                (col(c) <=> lit(prevC.min).cast(dt) ||
                  col(c) <=> lit(prevC.max).cast(dt)), 1L).otherwise(0L))
            Seq(
              sum(when(col(c).isNull, when(isAdd, 1L).otherwise(-1L))
                .otherwise(0L)).as(s"nulls_$c"),
              hll_sketch_agg(when(isAdd, col(c)).cast("string")).as(s"hll_$c"),
              min(when(isAdd, col(c))).as(s"addmin_$c"),
              max(when(isAdd, col(c))).as(s"addmax_$c"),
              remHits.as(s"remhit_$c"))
          }
        val r = feed.agg(aggs.head, aggs.tail: _*).head()
        if (r.getAs[Long]("__n") == 0L) {
          // nothing changed between the versions: restamp as-is
          val st = p.copy(version = m.version, bytes = onDiskBytes(spark, m))
          write(spark, root, st); return st
        }
        val rows = p.rows + r.getAs[Long]("__drows")
        // columns whose lower/upper bound may have SHRUNK re-scan
        // min/max in one column-pruned pass
        val rescan = cols.filter(c => r.getAs[Long](s"remhit_$c") == 1L)
        val exact: Map[String, (String, String)] =
          if (rescan.isEmpty) Map.empty
          else {
            val merged = PkTableSink.readTxCols(spark, root, rescan)
            val exAggs = rescan.flatMap(c => Seq(
              min(col(c)).cast("string").as(s"min_$c"),
              max(col(c)).cast("string").as(s"max_$c")))
            val ex = merged.agg(exAggs.head, exAggs.tail: _*).head()
            rescan.map(c => c -> (
              Option(ex.getAs[String](s"min_$c")).getOrElse(""),
              Option(ex.getAs[String](s"max_$c")).getOrElse(""))).toMap
          }
        // sketch unions + widened min/max, one tiny driver-local job
        val b64dec = java.util.Base64.getDecoder
        val unionExprs = cols.zipWithIndex.flatMap { case (c, i) =>
          val dt = schema(c).dataType
          val prevC = p.cols(c)
          val hadValues = prevC.nulls < p.rows
          val oldSk =
            if (prevC.hll.isEmpty) lit(null).cast("binary")
            else lit(b64dec.decode(prevC.hll))
          val addSk = Option(r.getAs[Array[Byte]](s"hll_$c"))
            .map(lit(_)).getOrElse(lit(null).cast("binary"))
          val union = coalesce(
            when(oldSk.isNotNull && addSk.isNotNull, hll_union(oldSk, addSk)),
            oldSk, addSk)
          val addMin = lit(r.getAs[Any](s"addmin_$c")).cast(dt)
          val addMax = lit(r.getAs[Any](s"addmax_$c")).cast(dt)
          val oldMin = if (hadValues) lit(prevC.min).cast(dt)
                       else lit(null).cast(dt)
          val oldMax = if (hadValues) lit(prevC.max).cast(dt)
                       else lit(null).cast(dt)
          Seq(union.as(s"u_$c"),
            when(union.isNull, 0L).otherwise(hll_sketch_estimate(union)).as(s"e_$c"),
            least(addMin, oldMin).cast("string").as(s"mn_$c"),
            greatest(addMax, oldMax).cast("string").as(s"mx_$c"))
        }
        val u = spark.range(1).select(unionExprs: _*).head()
        val colStats = cols.map { c =>
          val (mn, mx) = exact.getOrElse(c, (
            Option(u.getAs[String](s"mn_$c")).getOrElse(""),
            Option(u.getAs[String](s"mx_$c")).getOrElse("")))
          c -> ColStat(
            p.cols(c).nulls + r.getAs[Long](s"nulls_$c"),
            u.getAs[Long](s"e_$c"), mn, mx,
            b64(u.getAs[Array[Byte]](s"u_$c")))
        }.toMap
        val st = Stats(m.version, rows, onDiskBytes(spark, m), colStats)
        write(spark, root, st)
        st
    }
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
