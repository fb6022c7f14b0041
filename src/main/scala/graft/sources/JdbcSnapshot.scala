package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned-parallel JDBC snapshot of a source database table —
  * the initial-load half of a CDC pipeline (Debezium
  * `snapshot.mode=initial` over the MySQL source;
  * mysql-cdc-debezium-starrocks debezium-connector.json,
  * mysql/init/01-init.sql:4-18), re-expressed as a Spark source: the
  * table is split into `numPartitions` ranges of a numeric partition
  * column and each executor pulls its own range with an independent
  * connection, so snapshot throughput scales with the cluster, not
  * with one JDBC socket.
  *
  * Scale notes: Spark's JDBC relation pushes filters and column
  * pruning into the generated per-partition SELECTs (plan-asserted in
  * JdbcSnapshotSpec), so a filtered snapshot ships only matching rows
  * over the wire. Bounds should cover the real min/max of the
  * partition column — rows outside land in the first/last partition
  * (never lost, only skewed). [[snapshotAuto]] probes them with one
  * MIN/MAX query, the same thing a human would hand-tune. For
  * non-numeric keys, snapshot by a surrogate (auto-increment PK —
  * which the reference schema has on every table).
  */
object JdbcSnapshot {

  private def props(user: Option[String], password: Option[String],
                    driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Single-connection snapshot (small dimension tables). */
  def snapshot(spark: SparkSession, url: String, table: String,
               user: Option[String] = None, password: Option[String] = None,
               driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))

  /** Partitioned-parallel snapshot: `numPartitions` concurrent range
    * reads over `partitionColumn` (numeric, e.g. the auto-increment
    * PK) between the given bounds.
    */
  def snapshotPartitioned(spark: SparkSession, url: String, table: String,
                          partitionColumn: String, lowerBound: Long, upperBound: Long,
                          numPartitions: Int,
                          user: Option[String] = None, password: Option[String] = None,
                          driver: Option[String] = None): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(lowerBound <= upperBound, "lowerBound must be <= upperBound")
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password, driver))
  }

  /** [[snapshotPartitioned]] with bounds probed by one MIN/MAX query
    * (pushed down to the database as an aggregate over the dbtable
    * subquery — constant-cost on an indexed PK). Falls back to a
    * single-partition read when the table is empty.
    */
  def snapshotAuto(spark: SparkSession, url: String, table: String,
                   partitionColumn: String, numPartitions: Int,
                   user: Option[String] = None, password: Option[String] = None,
                   driver: Option[String] = None): DataFrame = {
    val bounds = spark.read
      // no leading underscore in the alias: some engines (Derby)
      // reject identifiers starting with '_'
      .jdbc(url, s"(SELECT MIN($partitionColumn) AS lo, MAX($partitionColumn) AS hi " +
        s"FROM $table) AS graft_bounds", props(user, password, driver))
      .collect()(0)
    if (bounds.isNullAt(0)) snapshot(spark, url, table, user, password, driver)
    else snapshotPartitioned(spark, url, table, partitionColumn,
      // the driver types MIN/MAX after its own column type (INT,
      // BIGINT, DECIMAL…) — normalize via Number
      bounds.getAs[Number](0).longValue(), bounds.getAs[Number](1).longValue(),
      numPartitions, user, password, driver)
  }
}
