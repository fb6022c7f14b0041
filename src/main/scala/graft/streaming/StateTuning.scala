package graft.streaming

import org.apache.spark.sql.SparkSession

/** Tuned state-store configuration for large keyed streaming state.
  *
  * The default HDFS-backed state store keeps every key on the JVM
  * heap — fine for thousands of keys, an OOM machine for the
  * hundreds of millions a 100 TB CDC table carries per executor.
  * RocksDB moves state off-heap onto local SSD with these choices:
  *
  *  - **changelog checkpointing**: per-batch checkpoint uploads only
  *    the batch's delta, not a full SST snapshot — commit cost scales
  *    with the batch, not with total state size (the difference
  *    between seconds and minutes per batch at 10⁸ keys);
  *  - **bounded memory**: one shared block-cache/memtable budget per
  *    executor instead of per-store unbounded growth, so state memory
  *    is a fixed planning number (`maxMemoryUsageMB`) independent of
  *    how many partitions land on the executor;
  *  - **no compact-on-commit**: background compaction only — commit
  *    latency stays flat; RocksDB absorbs write bursts in memtables.
  *
  * See ARCHITECTURE.md "RocksDB state store" for the sizing notes.
  */
object StateTuning {

  /** Session-settable confs (read at query start, so they apply to
    * queries started after setting them — no session rebuild needed). */
  val rocksDbConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "512",
    "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB" -> "64",
    "spark.sql.streaming.stateStore.rocksdb.compactOnCommit" -> "false")

  /** Run `body` with the RocksDB tuning applied to the session,
    * restoring the previous values after — queries STARTED inside
    * `body` keep the tuned store for their lifetime. */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = rocksDbConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    rocksDbConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
