package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.sources.JdbcSnapshot

/** Partitioned JDBC snapshot against an embedded Derby database (ships
  * with Spark — fully offline): parallel range reads, predicate/column
  * pushdown into the per-partition SELECTs, auto-probed bounds.
  */
class JdbcSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:snapdb;create=true"
  private val nRows = 1000

  // one-time seed; lazily forced by every test
  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE customers (
          |  id INT NOT NULL PRIMARY KEY,
          |  name VARCHAR(64) NOT NULL,
          |  city VARCHAR(32) NOT NULL,
          |  balance BIGINT NOT NULL)""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO customers VALUES (?, ?, ?, ?)")
      (1 to nRows).foreach { i =>
        ps.setInt(1, i)
        ps.setString(2, s"cust-$i")
        ps.setString(3, if (i % 3 == 0) "PARIS" else "LONDON")
        ps.setLong(4, i * 10L)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("partitioned snapshot: n parallel range reads, complete and exact") {
    seeded
    val df = JdbcSnapshot.snapshotPartitioned(spark, url, "customers",
      partitionColumn = "id", lowerBound = 1L, upperBound = nRows.toLong,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // every partition pulls a disjoint share; nothing lost or doubled
    assert(df.count() == nRows)
    assert(df.agg(sum("balance")).as[Long].head() ==
      (1 to nRows).map(_ * 10L).sum)
    // rows outside the bounds are still captured (first/last range is
    // unbounded on its outer side)
    val narrow = JdbcSnapshot.snapshotPartitioned(spark, url, "customers",
      "id", lowerBound = 400L, upperBound = 600L, numPartitions = 3)
    assert(narrow.count() == nRows)
  }

  test("filters and projection push into the generated SQL") {
    seeded
    val df = JdbcSnapshot.snapshotPartitioned(spark, url, "customers",
        "id", 1L, nRows.toLong, 4)
      .where(col("city") === "PARIS")
      .select("id", "city")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("CITY"),
      s"filter not pushed to JDBC:\n$plan")
    assert(!plan.contains("NAME"), s"projection not pruned:\n$plan")
    assert(df.count() == nRows / 3)
  }

  test("auto bounds: one MIN/MAX probe sizes the ranges") {
    seeded
    val df = JdbcSnapshot.snapshotAuto(spark, url, "customers",
      partitionColumn = "id", numPartitions = 5)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == nRows)
  }

  test("empty table: auto bounds fall back to a single-partition read") {
    seeded
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE empty_t (id INT NOT NULL PRIMARY KEY, v VARCHAR(8))")
    finally conn.close()
    val df = JdbcSnapshot.snapshotAuto(spark, url, "empty_t", "id", 4)
    assert(df.count() == 0)
  }

  test("snapshot feeds the PK-table merge path (initial load → lake)") {
    // the reference's snapshot-then-stream bootstrap: JDBC initial
    // load lands in the transactional lake, later CDC batches merge in
    seeded
    val root = TestTmp.dir("jdbcsnap").toString + "/t"
    val snap = JdbcSnapshot.snapshotPartitioned(spark, url, "customers",
        "id", 1L, nRows.toLong, 4)
      .withColumn("ver", lit(0L)).withColumn("del", lit(false))
    graft.sinks.PkTableSink.mergeTx(spark, root, snap,
      Seq("id"), Seq("ver"), "del", writer = "snapshot")
    val t = graft.sinks.PkTableSink.readTx(spark, root, snap.drop("del"))
    assert(t.count() == nRows)
  }
}
