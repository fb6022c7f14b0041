package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-health DIAGNOSTIC — the code counterpart of
  * docs/TROUBLESHOOTING.md: one call reports everything the freshness
  * protocols know about a TxLog-backed table root, so an operator
  * reads WHY a query took the slow path instead of rediscovering each
  * sidecar's staleness rule by hand.
  *
  * Every check mirrors the serving rule exactly (same version-stamp
  * comparisons [[TableStats]]/[[GlobalDict]] apply, same chain walk
  * [[InvertedIndex.isCurrent]] does), so the report can never disagree
  * with what readers will actually do. Pure read-only: no repair is
  * attempted — each finding names the call that would fix it.
  */
object Doctor {

  /** One finding: what was checked, its state, and — when degraded —
    * the remedy call. */
  final case class Finding(check: String, ok: Boolean, detail: String,
                           remedy: String = "")

  final case class Report(root: String, version: Long, findings: Seq[Finding]) {
    def degraded: Seq[Finding] = findings.filterNot(_.ok)
    def healthy: Boolean = degraded.isEmpty
    def render: String = {
      val head = s"table $root @ v$version"
      val body = findings.map { f =>
        val mark = if (f.ok) "ok  " else "WARN"
        val remedy = if (f.remedy.nonEmpty) s" -> ${f.remedy}" else ""
        s"  [$mark] ${f.check}: ${f.detail}$remedy"
      }
      (head +: body).mkString("\n")
    }
  }

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Examine `root`. Throws only when the root has no committed
    * version at all (nothing to diagnose). */
  def examine(spark: SparkSession, root: String): Report = {
    val m = TxLog.current(spark, root).getOrElse(throw new IllegalStateException(
      s"Doctor.examine: no committed version under $root"))
    val fs = fsOf(spark, root)
    val names = fs.listStatus(new Path(root)).map(_.getPath.getName).toSeq
    val findings = Seq.newBuilder[Finding]

    // merge-on-read depth: how many delta dirs every read must merge
    val nDeltas = m.deltas.size
    findings += Finding("delta chain", nDeltas <= 8,
      s"$nDeltas outstanding delta dir(s) behind the base",
      if (nDeltas > 8) "PkTableSink.compactTx folds them into one sorted base" else "")

    // partial-column deltas gate whole-row readers entirely
    val partial = m.meta.keys.count(_.startsWith("pcols."))
    findings += Finding("partial-column deltas", partial == 0,
      if (partial == 0) "none outstanding"
      else s"$partial partial delta(s): whole-row reads refuse this table",
      if (partial > 0) "PkTableSink.compactTxPartial folds back to full rows" else "")

    // ANALYZE stats: stale stats silently withdraw the measured
    // broadcast path
    findings += (TableStats.statsTx(spark, root) match {
      case Some(st) => Finding("table stats", ok = true,
        s"fresh at v${m.version} (${st.rows} rows, ${st.bytes} bytes)")
      case None =>
        val any = names.exists(_.startsWith("_stats.v"))
        Finding("table stats", ok = false,
          if (any) "present but STALE (a commit landed since ANALYZE)"
          else "never analyzed — dimension broadcasts rely on planner guesses",
          if (any) "TableStats.refreshTx extends them from the change feed (∝ delta)"
          else "TableStats.analyzeTx measures at the current version")
    })

    // global dictionaries: per encoded column, serving or withdrawn
    val dictCols = names.collect {
      case n if n.startsWith("_dict.") =>
        n.stripPrefix("_dict.").takeWhile(_ != '.')
    }.distinct
    dictCols.foreach { c =>
      findings += (GlobalDict.dictTx(spark, root, c) match {
        case Some(_) => Finding(s"dict '$c'", ok = true, s"fresh at v${m.version}")
        case None => Finding(s"dict '$c'", ok = false,
          "stale — encoded reads fall back to raw strings",
          s"GlobalDict.refreshTx(root, \"$c\") appends new codes from " +
            "the change feed (buildTx for a sorted full rebuild)")
      })
    }

    // inverted index: live chain must reach the current version
    if (names.exists(_.startsWith("_invidx."))) {
      val current = InvertedIndex.isCurrent(spark, root)
      findings += Finding("inverted index", current,
        if (current) "chain reaches the current version"
        else "chain broken — MATCH queries run the exact full-scan fallback",
        if (!current) "InvertedIndex.updateTx extends the chain from the change feed" else "")
    }

    // sidecar garbage: stale stamped generations are dead weight
    val staleStats = names.count(n => n.startsWith("_stats.v") &&
      n != s"_stats.v${m.version}")
    val staleDicts = names.count(n => n.startsWith("_dict.") &&
      !n.endsWith(s".v${m.version}"))
    val garbage = staleStats + staleDicts
    findings += Finding("sidecar garbage", garbage == 0,
      s"$garbage stale stamped sidecar generation(s)",
      if (garbage > 0) "SidecarGc.vacuum removes unreachable generations" else "")

    Report(root, m.version, findings.result())
  }

  /** CLOSED-LOOP maintenance: apply the remedy each degraded finding
    * names, under the same concurrency contracts as doing it by hand
    * (compactions are ordinary optimistic commits; refreshes write
    * new stamped generations readers only see once complete) — so
    * concurrent readers are never disturbed and a re-run on a healthy
    * table is a no-op. Order matters and is fixed here:
    *
    *  1. structural compactions FIRST (partial-column fold, then
    *     delta-chain fold) — they commit new versions, which would
    *     immediately re-stale any freshness work done before them;
    *  2. freshness refreshes (stats, dicts, inverted index), each ∝
    *     the change feed via the refreshTx/updateTx paths;
    *  3. sidecar GC LAST — it removes superseded generations, and
    *     must run after the refreshes that consume them as bases.
    *
    * `invertedIndexCols` carries the (idCol, textCol) the index was
    * built over; without it a broken index chain is left degraded
    * (reported, not guessed). A dict whose refresh overflows
    * `dictMaxCardinality` also stays degraded — the report says so.
    * Returns the post-repair report; callers compare
    * `examine(...)` before / after or just check `.healthy`. */
  def repair(spark: SparkSession, root: String, writer: String,
             invertedIndexCols: Option[(String, String)] = None,
             dictMaxCardinality: Long = 1L << 22): Report = {
    val before = examine(spark, root)
    def bad(check: String) = before.degraded.exists(_.check == check)
    if (bad("partial-column deltas"))
      PkTableSink.compactTxPartial(spark, root, writer)
    if (bad("delta chain"))
      PkTableSink.compactTx(spark, root, writer)
    val compacted = bad("partial-column deltas") || bad("delta chain")
    val names = fsOf(spark, root).listStatus(new Path(root))
      .map(_.getPath.getName).toSeq
    // stats: refresh when stale/absent, or when a compaction above
    // re-staled a previously-fresh sidecar (refreshTx falls back to
    // the full analyze exactly when no generation exists to extend)
    val statsPresent = names.exists(_.startsWith("_stats.v"))
    if (bad("table stats") || (statsPresent && compacted))
      TableStats.refreshTx(spark, root)
    // dicts: every column with any generation on disk
    names.collect {
      case n if n.startsWith("_dict.") =>
        n.stripPrefix("_dict.").takeWhile(_ != '.')
    }.distinct.foreach { c =>
      if (GlobalDict.dictTx(spark, root, c).isEmpty)
        GlobalDict.refreshTx(spark, root, c, dictMaxCardinality)
    }
    if (names.exists(_.startsWith("_invidx.")) &&
        (!InvertedIndex.isCurrent(spark, root) || compacted))
      invertedIndexCols.foreach { case (id, txt) =>
        InvertedIndex.updateTx(spark, root, id, txt)
      }
    SidecarGc.vacuum(spark, root)
    examine(spark, root)
  }

  /** CLI: `sbt "runMain graft.sinks.Doctor <tableRoot> [...]"` —
    * prints one report per root; exits 1 if any is degraded (usable
    * as a health gate in a cron/CI step). */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Doctor <tableRoot> [...]")
    val spark = graft.GraftSession.get()
    val reports = args.toSeq.map(examine(spark, _))
    reports.foreach(r => println(r.render))
    spark.stop()
    if (reports.exists(!_.healthy)) sys.exit(1)
  }
}
