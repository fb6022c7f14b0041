package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Delta/Iceberg-shaped transactional commit log for a lake table.
  *
  * Layout under the table root:
  * {{{
  *   _log/<version>.manifest   one small file per committed version
  *   t<version>-<writer>-.../  immutable data snapshots (parquet)
  * }}}
  *
  * Protocol (optimistic concurrency, same shape as Delta's log store
  * contract and Iceberg's metadata-pointer swap):
  *  1. a writer reads the current manifest (base version N),
  *  2. writes its new snapshot to a writer-unique data dir,
  *  3. claims version N+1 by creating `_log/<N+1>.manifest`
  *     create-exclusive — exactly one racing writer succeeds,
  *  4. a loser deletes its orphan snapshot, re-reads current (now the
  *     winner's N+1), re-merges, and retries at N+2.
  *
  * Readers resolve "current" as the HIGHEST FULLY-WRITTEN manifest: a
  * manifest missing its terminal `ok=true` line (reader raced the
  * commit's content write) is skipped, so a concurrent reader lands on
  * the previous version — never on a torn table. Data dirs are
  * immutable once a manifest references them, so a reader holding
  * version N is isolated from later commits (time travel for free;
  * [[PkTableSink.vacuumTx]] bounds retention).
  *
  * Create-exclusive is atomic on HDFS-like filesystems. On `file://`
  * (RawLocalFileSystem) create(!overwrite) is check-then-create, so a
  * JVM-wide per-root mutex closes that race for writers sharing a
  * driver — the same HDFS-native / local-locked split delta-io
  * documents for its LogStores. Reference analogue: StarRocks PK
  * tables accepting concurrent Routine Load + Stream Load publishes
  * (mysql-cdc-debezium-starrocks benchmark.sh:417,
  * create-starrocks-tables.sh:1-51).
  */
object TxLog {

  /** @param tables multi-table commits: table name → data dir. A
    *   manifest listing tables flips ALL of them atomically — readers
    *   of one version see a cross-table-consistent snapshot (the
    *   property single-table logs can't give a pipeline loading
    *   several tables from one source).
    * @param deltas merge-on-read: ordered delta dirs layered over
    *   `dataDir` (the base). A commit that appends a delta carries the
    *   base and earlier deltas FORWARD — data dirs are shared across
    *   versions, so retention must reference-count, never age out by
    *   version alone.
    * @param meta small table metadata (e.g. the PK/version columns a
    *   reader needs to merge base ∪ deltas) — the log is
    *   self-describing, readers need no out-of-band schema. */
  final case class Manifest(version: Long, dataDir: String,
                            baseVersion: Long, writer: String,
                            tables: Map[String, String] = Map.empty,
                            deltas: Seq[String] = Nil,
                            meta: Map[String, String] = Map.empty)

  /** What one commit attempt prepared: the manifest payload plus the
    * dirs this attempt wrote (deleted if the claim is lost). */
  final case class Prepared(dataDir: String = "",
                            tables: Map[String, String] = Map.empty,
                            deltas: Seq[String] = Nil,
                            meta: Map[String, String] = Map.empty,
                            written: Seq[String] = Nil)

  private val LogDir = "_log"

  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, version: Long): Path =
    new Path(s"$root/$LogDir/$version.manifest")

  /** Highest fully-written manifest, or None for an absent/empty log.
    * Partially-written manifests are skipped (see class doc). */
  def current(spark: SparkSession, root: String): Option[Manifest] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/$LogDir")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".manifest").toLong).toOption)
      .sorted(Ordering[Long].reverse)
      .iterator.flatMap(v => read(fs, root, v)).nextOption()
  }

  private def read(fs: FileSystem, root: String, version: Long): Option[Manifest] = {
    val txt = try {
      val in = fs.open(manifestPath(root, version))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: java.io.IOException => return None }
    val kv = txt.linesIterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    if (!kv.get("ok").contains("true")) None // torn read: commit in flight
    else for { data <- kv.get("data"); base <- kv.get("base"); w <- kv.get("writer") }
      yield Manifest(version, data, base.toLong, w,
        kv.collect { case (k, v) if k.startsWith("t.") => k.drop(2) -> v },
        kv.get("deltas").toSeq.flatMap(_.split(",")).filter(_.nonEmpty),
        kv.collect { case (k, v) if k.startsWith("k.") => k.drop(2) -> v })
  }

  /** Atomically claim `m.version`. Returns false when another writer
    * holds it — the caller re-reads current and retries.
    *
    * After writing the body the manifest is RE-READ and must match:
    * [[reclaimTorn]] may steal the claim of a live writer stalled past
    * the grace between its create and its content write (long GC / FS
    * stall); that writer's write then lands on an unlinked file (or a
    * rival's fresh claim occupies the path). Without the read-back it
    * would report success while its batch is silently lost. The check
    * costs one read of a manifest-sized file. */
  def tryCommit(spark: SparkSession, root: String, m: Manifest): Boolean = {
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(s"$root/$LogDir"))
    val tableLines = m.tables.toSeq.sortBy(_._1)
      .map { case (t, d) => s"t.$t=$d\n" }.mkString
    val deltaLine =
      if (m.deltas.isEmpty) "" else s"deltas=${m.deltas.mkString(",")}\n"
    val metaLines = m.meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s"k.$k=$v\n" }.mkString
    val body =
      s"data=${m.dataDir}\nbase=${m.baseVersion}\nwriter=${m.writer}\n" +
        deltaLine + metaLines + tableLines + "ok=true\n"
    lockFor(root).synchronized {
      val p = manifestPath(root, m.version)
      if (fs.exists(p)) false
      else {
        val claimed = try Some(fs.create(p, false))
        catch { case _: java.io.IOException => None }
        claimed match {
          case None => false
          case Some(out) =>
            try out.write(body.getBytes("UTF-8")) finally out.close()
            // read-back: our content, at the path, fully committed
            read(fs, root, m.version).contains(m)
        }
      }
    }
  }

  /** All FULLY-COMMITTED versions, ascending (for retention / time
    * travel). Torn manifests (crashed mid-commit) are excluded, the
    * same rule readers apply — so retention math never counts a
    * version nobody can read. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/$LogDir")
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".manifest").toLong).toOption)
      .filter(v => read(fs, root, v).isDefined)
      .sorted.toSeq
  }

  /** Manifest of one specific committed version (time travel). */
  def at(spark: SparkSession, root: String, version: Long): Option[Manifest] =
    read(fsOf(spark, root), root, version)

  /** Delete a version's manifest; returns whether the file is gone. */
  def delete(spark: SparkSession, root: String, version: Long): Boolean = {
    val fs = fsOf(spark, root)
    val p = manifestPath(root, version)
    fs.delete(p, false) || !fs.exists(p)
  }

  /** The optimistic commit loop every transactional writer shares
    * (single-table merge, multi-table group, IVF index maintenance —
    * one implementation, so protocol fixes land once). Per attempt,
    * `work` runs against the CURRENT manifest, writes only fresh
    * dirs, and returns (dataDir, tables, dirs it wrote); a lost race
    * deletes the orphan dirs, reclaims a torn claim past the grace,
    * and re-runs `work` against the winner's manifest. */
  def commitWith(spark: SparkSession, root: String, writer: String,
                 maxAttempts: Int = 5, recoverTornAfterMs: Long = 60000L)(
      work: Option[Manifest] => Prepared): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = current(spark, root)
      val prep = work(base)
      prep.deltas.foreach(d => require(
        d.nonEmpty && !d.contains(",") && !d.contains("\n"),
        s"invalid delta dir '$d'"))
      prep.meta.foreach { case (k, v) => require(
        k.nonEmpty && !k.contains("=") && !k.contains("\n") && !v.contains("\n"),
        s"invalid manifest meta '$k'='$v'") }
      val next = base.map(_.version + 1).getOrElse(0L)
      if (tryCommit(spark, root,
          Manifest(next, prep.dataDir, base.map(_.version).getOrElse(-1L), writer,
            prep.tables, prep.deltas, prep.meta)))
        return next
      val fs = fsOf(spark, root)
      prep.written.foreach(d => fs.delete(new Path(d), true))
      if (at(spark, root, next).isEmpty)
        reclaimTorn(spark, root, next, recoverTornAfterMs)
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit: lost $maxAttempts consecutive commit races on $root")
  }

  /** Reclaim a TORN claim: a writer that crashed between creating
    * `_log/<version>.manifest` and writing its `ok=true` line holds
    * the version forever — without reclaim, every later commit
    * re-computes the same next version and loses, wedging the table.
    * Deletes the manifest iff it exists, does NOT parse as committed,
    * and is older than `graceMs` (grace covers a LIVE writer between
    * its create and its content write — that window is milliseconds;
    * a torn file past the grace is a corpse). Returns true if a claim
    * was reclaimed. */
  def reclaimTorn(spark: SparkSession, root: String, version: Long,
                  graceMs: Long): Boolean = {
    val fs = fsOf(spark, root)
    val p = manifestPath(root, version)
    lockFor(root).synchronized {
      if (!fs.exists(p) || read(fs, root, version).isDefined) false
      else {
        val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        age >= graceMs && fs.delete(p, false)
      }
    }
  }
}
