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

  private def pointerFile(root: String) = new org.apache.hadoop.fs.Path(root, "_CURRENT")

  /** Current table contents (empty frame with `schemaOf` if absent). */
  def read(spark: SparkSession, root: String, schemaOf: => DataFrame): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) => spark.read.parquet(s"$root/v$v")
      case None    => schemaOf.limit(0)
    }

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = pointerFile(root)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
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

  /** Single-writer commit: write the pointer aside, swap it in. A real
    * multi-writer deployment replaces this with a transactional table
    * format's commit protocol (Delta/Iceberg) — same merge semantics.
    */
  private def commit(spark: SparkSession, root: String, version: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.tmp$version")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(pointerFile(root), false)
    if (!fs.rename(tmp, pointerFile(root)))
      throw new IllegalStateException(s"commit of v$version failed")
  }
}
