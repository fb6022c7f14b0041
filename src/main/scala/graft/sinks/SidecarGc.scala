package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Garbage collection for version-stamped AUXILIARY artifacts at a
  * table root — stats sidecars ([[TableStats]] `_stats.v<N>`), global
  * dictionaries ([[GlobalDict]] `_dict.<col>.v<N>`) and inverted-index
  * chains ([[InvertedIndex]] `_invidx.v<K>` / `_invidx.d<f>_<t>`).
  *
  * The freshness protocols make stale artifacts UNREACHABLE (served
  * only at their stamped version), so this GC is purely a storage
  * concern — it can never change a read's result. Kept:
  *
  *  - `_stats` / `_dict` entries stamped with the CURRENT version;
  *  - the inverted index's LIVE CHAIN (the newest full build ≤ current
  *    plus the delta hops that reach the current version) — dropping a
  *    mid-chain delta would break search back to the full-scan
  *    fallback, so the whole reachable chain survives;
  *
  * everything else with those prefixes is deleted. Data/delta dirs and
  * the TxLog are untouched ([[PkTableSink.vacuumTx]] owns those).
  */
object SidecarGc {

  /** Delete stale sidecar artifacts under `root`; returns the deleted
    * names. */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    val current = TxLog.current(spark, root).map(_.version).getOrElse(return Nil)

    // the inverted chain that search would actually serve
    val names = fs.listStatus(rootPath).map(_.getPath.getName).toSeq
    val bases = names.collect { case n if n.startsWith("_invidx.v") =>
      n.stripPrefix("_invidx.v").toLong
    }.filter(_ <= current)
    val deltas = names.collect { case n if n.startsWith("_invidx.d") =>
      val Array(f, t) = n.stripPrefix("_invidx.d").split("_")
      (f.toLong, t.toLong)
    }.groupBy(_._1).map { case (f, ts) => f -> ts.map(_._2).max }
    val liveChain: Set[String] = bases.sorted.lastOption.map { base =>
      var end = base
      var keep = Set(s"_invidx.v$base")
      while (end < current && deltas.contains(end) && deltas(end) <= current) {
        val to = deltas(end)
        keep += s"_invidx.d${end}_$to"
        end = to
      }
      keep
    }.getOrElse(Set.empty)

    names.filter { n =>
      val stale =
        if (n.startsWith("_stats.v")) n != s"_stats.v$current"
        else if (n.startsWith("_dict.")) !n.endsWith(s".v$current")
        else if (n.startsWith("_invidx.")) !liveChain.contains(n)
        else false
      if (stale) fs.delete(new Path(rootPath, n), true)
      stale
    }
  }
}
