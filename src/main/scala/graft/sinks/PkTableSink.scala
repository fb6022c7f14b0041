package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.PkTable

/** Incremental primary-key table maintenance on a parquet lake path —
  * the continuously-refreshed StarRocks PK table, minus the database:
  * each micro-batch of changes merges into the stored table
  * (latest-wins by version, deletes drop keys) and atomically replaces
  * it via a versioned directory + pointer file.
  *
  * Scale notes: the merge is `PkTable.snapshotMerge` — one shuffle of
  * (current ∪ changes) hashed by key. For 100 TB tables the same code
  * runs per-partition when the table is stored partitioned by a key
  * range/date (merge only partitions containing changed keys — the
  * caller filters); a transactional table format (Delta/Iceberg) slots
  * in by replacing [[commit]] with its own MERGE, with identical
  * semantics.
  */
object PkTableSink {

  // Commit pointers are versioned files (_CURRENT.v<N>): a commit is
  // one atomic rename to a NEW name, and the current version resolves
  // as max(N) — there is no delete-then-rename window in which a crash
  // could leave the table pointing at nothing. Single-writer protocol;
  // a multi-writer deployment swaps in a transactional table format.
  private val PtrPrefix = "_CURRENT.v"

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current table contents (empty frame with `schemaOf` if absent). */
  def read(spark: SparkSession, root: String, schemaOf: => DataFrame): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) => spark.read.parquet(s"$root/v$v")
      case None    => schemaOf.limit(0)
    }

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return None
    val versions = fs.listStatus(rootPath).map(_.getPath.getName)
      .filter(_.startsWith(PtrPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(PtrPrefix).toLong).toOption)
    if (versions.nonEmpty) Some(versions.max)
    else {
      // legacy layout: a single _CURRENT file whose CONTENT is the
      // version — still readable so pre-existing tables migrate on
      // their next commit
      val legacy = new org.apache.hadoop.fs.Path(root, "_CURRENT")
      if (!fs.exists(legacy)) None
      else {
        val in = fs.open(legacy)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }
    }
  }

  /** Merge one batch of keyed changes into the table and commit a new
    * version. Deletes are rows where deleteFlag evaluates true.
    * Re-applying the same batch is idempotent (latest-wins by version).
    */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
            keyCols: Seq[String], versionCols: Seq[String], deleteFlag: String): Unit = {
    // the stored table never carries the delete flag; align schemas for
    // the union-based merge, then drop it again before writing
    val current = read(spark, root, changes.drop(deleteFlag))
      .withColumn(deleteFlag, lit(false))
    val merged = PkTable.snapshotMerge(current, changes,
      keyCols, versionCols.map(col), deleteFlag = col(deleteFlag))
      .drop(deleteFlag)
    val next = currentVersion(spark, root).getOrElse(-1L) + 1
    merged.write.mode(SaveMode.Overwrite).parquet(s"$root/v$next")
    commit(spark, root, next)
  }

  /** Lake maintenance: delete data version directories older than the
    * `keepVersions` most recent (current always kept). Old versions
    * exist for time travel / reader isolation; unbounded retention is
    * unbounded storage. Never touches pointers (crash-safe by the same
    * max(N)-resolution argument as [[commit]]); returns the versions
    * deleted.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Seq[Long] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return Nil
    val dataVersions = fs.listStatus(rootPath)
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
      .sorted
    if (dataVersions.isEmpty) Nil
    else {
      val current = currentVersion(spark, root)
      val cutoff = dataVersions.takeRight(keepVersions).head
      val victims = dataVersions.filter(v => v < cutoff && !current.contains(v))
      victims.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(root, s"v$v"), true))
      victims.toSeq
    }
  }

  /** Single-writer commit: write the pointer content aside, then one
    * atomic rename to `_CURRENT.v<version>`. A crash before the rename
    * leaves the previous pointer current; a crash after leaves the new
    * one current — no state points the table at nothing. Older
    * pointers (and any legacy `_CURRENT`) are pruned best-effort after
    * the rename; a crash mid-prune only leaves stale lower-numbered
    * pointers, which max(N) resolution ignores.
    *
    * Optimistic concurrency: rename-to-existing fails on HDFS-like
    * filesystems, so two writers racing to the same version number
    * cannot clobber each other — the loser gets an exception, never a
    * silent overwrite. (Package-visible for the protocol spec.)
    */
  private[graft] def commit(spark: SparkSession, root: String, version: Long): Unit = {
    val fs = fsOf(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.tmp$version")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(root, s"$PtrPrefix$version")
    if (!fs.rename(tmp, ptr))
      throw new IllegalStateException(s"commit of v$version failed")
    // best-effort cleanup — never load-bearing
    try {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      fs.listStatus(rootPath).map(_.getPath).foreach { p =>
        val n = p.getName
        val stale = n == "_CURRENT" || n.startsWith("_CURRENT.tmp") ||
          (n.startsWith(PtrPrefix) &&
            scala.util.Try(n.stripPrefix(PtrPrefix).toLong).toOption.exists(_ < version))
        if (stale) fs.delete(p, false)
      }
    } catch { case _: java.io.IOException => () }
  }
}
